#!/usr/bin/env python
"""In-loop per-stage timing of the warm serving loop (fresh arrays each iter)."""
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
dev.render_prepared(prepared).block_until_ready()

te_none = [(None, t) for t in tiles]

stages = {"prepare": 0.0, "xfer_wait": 0.0, "dispatch": 0.0, "wait": 0.0,
          "readback": 0.0, "png": 0.0}
REPS = 5
# warm-up one full iteration
p = dev.prepare(te_none, scale=1)
r = dev.render_prepared(p)
imgs = np.asarray(r)

for it in range(REPS):
    t0 = time.perf_counter()
    p = dev.prepare(te_none, scale=1)
    t1 = time.perf_counter()
    jax.block_until_ready(list(p.batch))
    t2 = time.perf_counter()
    r = dev.render_prepared(p)
    t3 = time.perf_counter()
    r.block_until_ready()
    t4 = time.perf_counter()
    imgs = np.asarray(jax.device_get(r))
    t5 = time.perf_counter()
    [rgb_to_png(imgs[i], 1) for i in range(n)]
    t6 = time.perf_counter()
    stages["prepare"] += t1 - t0
    stages["xfer_wait"] += t2 - t1
    stages["dispatch"] += t3 - t2
    stages["wait"] += t4 - t3
    stages["readback"] += t5 - t4
    stages["png"] += t6 - t5

tot = 0.0
for k, v in stages.items():
    ms = v / REPS * 1e3
    tot += ms
    print(f"{k:10s}: {ms:8.2f} ms")
print(f"{'TOTAL':10s}: {tot:8.2f} ms  ({n/tot*1e3:.1f} t/s)")
