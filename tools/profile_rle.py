#!/usr/bin/env python
"""Measure RLE compressibility of rendered minicity tiles (packed-rgb runs)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer

reader = GeodataReader.load("assets/fixtures/minicity.bin")
base, name = os.path.split("assets/stylesheets/default.mapcss")
styler = Styler(parse_file(base, name), "josm")
tx = reader.tiles["x"] >> 3
ty = reader.tiles["y"] >> 3
tiles = [Tile(15, x, y) for x, y in sorted(set(zip(tx.tolist(), ty.tolist())))]
te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256)
imgs = np.asarray(dev.render(te, scale=1))  # (T,256,256,3)

T = imgs.shape[0]
runs_all = []
for i in range(T):
    v = (
        imgs[i, :, :, 0].astype(np.uint32) << 16
        | imgs[i, :, :, 1].astype(np.uint32) << 8
        | imgs[i, :, :, 2].astype(np.uint32)
    ).reshape(-1)
    b = np.empty(v.shape, bool)
    b[0] = True
    b[1:] = v[1:] != v[:-1]
    runs_all.append(int(b.sum()))
runs_all = np.array(runs_all)
N = 256 * 256
print(f"tiles={T}  pixels/tile={N}")
print(f"runs/tile: min={runs_all.min()} p50={int(np.median(runs_all))} "
      f"mean={runs_all.mean():.0f} p90={int(np.percentile(runs_all,90))} max={runs_all.max()}")
# encoding cost: 6 bytes/run (u16 start + 3B rgb + 1B pad) vs 196608 raw
enc = runs_all * 6
print(f"bytes/tile @6B/run: mean={enc.mean()/1e3:.1f}KB  max={enc.max()/1e3:.1f}KB "
      f"(raw 196.6KB)  mean ratio={196608/enc.mean():.1f}x")
# column-major for comparison
runs_cm = []
for i in range(T):
    v = (
        imgs[i, :, :, 0].astype(np.uint32) << 16
        | imgs[i, :, :, 1].astype(np.uint32) << 8
        | imgs[i, :, :, 2].astype(np.uint32)
    ).T.reshape(-1)
    b = np.empty(v.shape, bool)
    b[0] = True
    b[1:] = v[1:] != v[:-1]
    runs_cm.append(int(b.sum()))
print(f"column-major runs/tile mean={np.mean(runs_cm):.0f}")
