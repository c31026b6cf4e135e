#!/usr/bin/env python
"""Time the device RLE encode graph alone, then render+encode+fetch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

from osm_renderer_tpu.ops import rle

print("A: make planar", flush=True)
rng = np.random.default_rng(0)
rgb = np.full((30, 256, 256, 3), 200, np.uint8)
for t in range(30):
    for _ in range(40):
        x0, y0 = rng.integers(0, 200, 2)
        rgb[t, y0:y0+30, x0:x0+30] = rng.integers(0, 255, 3)
planar_np = np.zeros((30, 4, 256, 256), np.uint8)
planar_np[:, :3] = rgb.transpose(0, 3, 1, 2)
planar = jnp.asarray(planar_np)
planar.block_until_ready()
print("B: encode compile start", time.strftime("%H:%M:%S"), flush=True)
t0 = time.perf_counter()
w = rle.encode_wire_device(planar, 393216)
w.block_until_ready()
print(f"C: first encode (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    w = rle.encode_wire_device(planar, 393216)
    w.block_until_ready()
    print(f"   encode run: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
t0 = time.perf_counter()
wn = np.asarray(w)
print(f"   wire fetch: {(time.perf_counter()-t0)*1e3:.1f} ms ({wn.nbytes/1e6:.2f} MB)", flush=True)
print("total_runs:", int(wn[1]), flush=True)
