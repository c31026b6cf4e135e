#!/usr/bin/env python
"""Raw axon-tunnel transfer characterization: d2h/h2d vs size, dtype, layout."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

add1 = jax.jit(lambda x: x + 1)


def fresh(shape, dtype):
    x = jnp.zeros(shape, dtype)
    x = add1(x)
    x.block_until_ready()
    return x


def t_d2h(shape, dtype=jnp.uint8, reps=3):
    ts = []
    for _ in range(reps):
        x = fresh(shape, dtype)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(x))
        ts.append(time.perf_counter() - t0)
    nbytes = np.zeros(shape, np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)).nbytes
    best = min(ts)
    print(f"d2h {str(shape):24s} {np.dtype(jnp.zeros((), dtype).dtype).name:8s} "
          f"{nbytes/1e6:8.2f}MB  {best*1e3:8.2f} ms  {nbytes/best/1e6:8.1f} MB/s")
    return best


def t_h2d(shape, dtype=np.uint8, reps=3):
    ts = []
    for _ in range(reps):
        x = np.random.randint(0, 255, size=shape).astype(dtype)
        t0 = time.perf_counter()
        y = jnp.asarray(x)
        y.block_until_ready()
        ts.append(time.perf_counter() - t0)
    nbytes = x.nbytes
    best = min(ts)
    print(f"h2d {str(shape):24s} {np.dtype(dtype).name:8s} "
          f"{nbytes/1e6:8.2f}MB  {best*1e3:8.2f} ms  {nbytes/best/1e6:8.1f} MB/s")
    return best


print("=== d2h ===")
t_d2h((256, 256, 3))
t_d2h((8, 256, 256, 3))
t_d2h((30, 256, 256, 3))
t_d2h((30, 4, 256, 256))
t_d2h((97, 256, 256, 3))
t_d2h((30, 256, 256, 3), jnp.float32)
print("=== transposed d2h (30,4,256,256)->slice+transpose ===")
x = fresh((30, 4, 256, 256), jnp.uint8)
y = x[:, :3].transpose(0, 2, 3, 1)
y.block_until_ready()
t0 = time.perf_counter(); np.asarray(jax.device_get(y)); print(f"  sliced+T: {(time.perf_counter()-t0)*1e3:.2f} ms")
print("=== h2d ===")
t_h2d((1 << 20,))
t_h2d((8 << 20,))
t_h2d((1 << 18,), np.float32)
t_h2d((1 << 20,), np.float32)
print("=== many small h2d (15 arrays x 0.5MB) ===")
arrs = [np.random.rand(128, 1024).astype(np.float32) for _ in range(15)]
t0 = time.perf_counter()
ys = [jnp.asarray(a) for a in arrs]
jax.block_until_ready(ys)
print(f"  15x0.5MB: {(time.perf_counter()-t0)*1e3:.2f} ms")
print("=== device_put vs asarray (6MB) ===")
a = np.random.randint(0, 255, size=(30, 256, 256, 3)).astype(np.uint8)
for f, nm in [(jnp.asarray, "asarray"), (jax.device_put, "device_put")]:
    t0 = time.perf_counter()
    y = f(a); y.block_until_ready()
    print(f"  {nm}: {(time.perf_counter()-t0)*1e3:.2f} ms")
