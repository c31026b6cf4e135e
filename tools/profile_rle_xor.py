#!/usr/bin/env python
"""Compare RLE run counts: raw packed-RGB rows vs XOR-with-row-above
(PNG 'Up'-filter analogue, lossless on the packed word since XOR has no
cross-channel carries).  Decides whether the serving wire should ship
xor-predicted runs."""
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
ts = imgs.shape[1]
N = ts * ts


def count_runs(v):
    """v: (ts*ts,) with forced boundaries every 256 px (the wire's BLOCK)."""
    idx = np.arange(v.shape[0])
    b = np.empty(v.shape, bool)
    b[0] = True
    b[1:] = v[1:] != v[:-1]
    b |= idx % 256 == 0
    return int(b.sum())


raw_runs, xor_runs = [], []
for i in range(T):
    p = (
        imgs[i, :, :, 0].astype(np.uint32) << 16
        | imgs[i, :, :, 1].astype(np.uint32) << 8
        | imgs[i, :, :, 2].astype(np.uint32)
    )
    raw_runs.append(count_runs(p.reshape(-1)))
    up = np.zeros_like(p)
    up[1:] = p[:-1]
    xor_runs.append(count_runs((p ^ up).reshape(-1)))

raw_runs = np.array(raw_runs)
xor_runs = np.array(xor_runs)
print(f"tiles={T}")
print(
    f"raw runs/tile: mean={raw_runs.mean():.0f} p90={np.percentile(raw_runs,90):.0f}"
    f" max={raw_runs.max()}  -> {4*raw_runs.mean()/1e3:.1f} KB/tile"
)
print(
    f"xor runs/tile: mean={xor_runs.mean():.0f} p90={np.percentile(xor_runs,90):.0f}"
    f" max={xor_runs.max()}  -> {4*xor_runs.mean()/1e3:.1f} KB/tile"
)
print(
    f"xor/raw run ratio (>1 means Up predictor is WORSE): "
    f"{xor_runs.mean()/raw_runs.mean():.2f}x"
)
