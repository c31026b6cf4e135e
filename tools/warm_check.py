#!/usr/bin/env python
"""Warm-pipeline stage timing + RLE parity on the real device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer
from osm_renderer_tpu.draw.png_writer import rgb_to_png
from osm_renderer_tpu.ops.render_pallas import planar_to_rgb

reader = GeodataReader.load("assets/fixtures/minicity.bin")
base, name = os.path.split("assets/stylesheets/default.mapcss")
styler = Styler(parse_file(base, name), "josm")
tx = reader.tiles["x"] >> 3
ty = reader.tiles["y"] >> 3
tiles = [Tile(15, x, y) for x, y in sorted(set(zip(tx.tolist(), ty.tolist())))]
te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
n = len(te)
dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256)
prepared = dev.prepare(te, scale=1)
print("warmup render+encode (compiles)...", flush=True)
rgb1 = dev.fetch_rgb_rle(dev.render_prepared_rle(prepared))
rgb1 = dev.fetch_rgb_rle(dev.render_prepared_rle(prepared))
print("parity vs raw planar...", flush=True)
raw = planar_to_rgb(np.asarray(dev.render_prepared_planar(prepared)))
print("RLE == raw:", np.array_equal(rgb1, raw), flush=True)

te_none = [(None, t) for t in tiles]
stages = dict.fromkeys(
    ["prepare", "xfer_wait", "dispatch", "wait", "fetch_decode", "png"], 0.0
)
REPS = 5
p = dev.prepare(te_none, scale=1)
r = dev.render_prepared_rle(p)
rgb = dev.fetch_rgb_rle(r)
for it in range(REPS):
    t0 = time.perf_counter()
    p = dev.prepare(te_none, scale=1)
    t1 = time.perf_counter()
    jax.block_until_ready(list(p.batch))
    t2 = time.perf_counter()
    r = dev.render_prepared_rle(p)
    t3 = time.perf_counter()
    r.wire.block_until_ready()
    t4 = time.perf_counter()
    rgb = dev.fetch_rgb_rle(r)
    t5 = time.perf_counter()
    [rgb_to_png(rgb[i], 1) for i in range(n)]
    t6 = time.perf_counter()
    for k, d in zip(stages, [t1-t0, t2-t1, t3-t2, t4-t3, t5-t4, t6-t5]):
        stages[k] += d
tot = 0.0
for k, v in stages.items():
    ms = v / REPS * 1e3
    tot += ms
    print(f"{k:12s}: {ms:8.2f} ms", flush=True)
print(f"{'TOTAL':12s}: {tot:8.2f} ms  ({n/tot*1e3:.1f} t/s unpipelined)", flush=True)

# pipelined warm (bench-style)
def warm_pipelined(nb):
    inflight = None
    t0 = time.perf_counter()
    for b in range(nb):
        p = dev.prepare(te_none, scale=1)
        r = dev.render_prepared_rle(p)
        try:
            r.wire.copy_to_host_async()
        except Exception:
            pass
        if inflight is not None:
            rgb = dev.fetch_rgb_rle(inflight)
            [rgb_to_png(rgb[i], 1) for i in range(n)]
        inflight = r
    rgb = dev.fetch_rgb_rle(inflight)
    [rgb_to_png(rgb[i], 1) for i in range(n)]
    return nb * n / (time.perf_counter() - t0)

warm_pipelined(1)
print(f"warm pipelined: {warm_pipelined(4):.1f} t/s", flush=True)
