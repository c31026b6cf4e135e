#!/usr/bin/env python
"""Run-count statistics for filtered encodings (host-only, CPU oracle)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.draw.drawer import CpuDrawer
from osm_renderer_tpu.draw.png_writer import rgb_to_png

reader = GeodataReader.load("assets/fixtures/minicity.bin")
base, name = os.path.split("assets/stylesheets/default.mapcss")
styler = Styler(parse_file(base, name), "josm")
tx = reader.tiles["x"] >> 3
ty = reader.tiles["y"] >> 3
tiles = [Tile(15, x, y) for x, y in sorted(set(zip(tx.tolist(), ty.tolist())))]
cpu = CpuDrawer()
imgs = np.stack([
    cpu.draw_to_pixels(reader.get_entities_in_tile_with_neighbors(t), t, 1, styler)
    for t in tiles
])  # (T,256,256,3)
T, ts = imgs.shape[0], imgs.shape[1]
N = ts * ts


def runs(v2d):  # (T, M) -> per-tile run counts
    out = []
    for i in range(v2d.shape[0]):
        v = v2d[i]
        out.append(1 + int((v[1:] != v[:-1]).sum()))
    return np.array(out)


def pack(rgb):  # (T,ts,ts,3) u8 -> (T,N) i32
    return (
        rgb[..., 0].astype(np.int32) << 16
        | rgb[..., 1].astype(np.int32) << 8
        | rgb[..., 2].astype(np.int32)
    ).reshape(T, -1)


def stats(tag, r, bytes_per_run):
    # add split cost for 8-bit lengths: ~N/256 extra runs worst case ignored
    print(f"{tag:28s} mean={r.mean():8.0f} p90={int(np.percentile(r,90)):6d} "
          f"max={r.max():6d}  mean {r.mean()*bytes_per_run/1e3:6.1f}KB @{bytes_per_run}B/run")


stats("plain packed rgb", runs(pack(imgs)), 4)

xor = imgs.copy()
xor[:, 1:] ^= imgs[:, :-1]
stats("xor-up packed rgb", runs(pack(xor)), 4)

sub = imgs.astype(np.int16)
sub[:, :, 1:] -= imgs[:, :, :-1].astype(np.int16)
sub = (sub & 0xFF).astype(np.uint8)
stats("sub-left packed rgb", runs(pack(sub)), 4)

both = xor.astype(np.int16)
both[:, :, 1:] -= xor[:, :, :-1].astype(np.int16)
both = (both & 0xFF).astype(np.uint8)
stats("xor-up then sub-left", runs(pack(both)), 4)

# zero-fraction after xor filter (how much is exactly 0 -> sparse encoding?)
z = (pack(xor) == 0).mean(axis=1)
print(f"xor-up zero fraction: mean={z.mean():.3f} min={z.min():.3f}")

# png sizes for comparison
pngs = [len(rgb_to_png(imgs[i], 1)) for i in range(T)]
print(f"png level1 bytes: mean={np.mean(pngs)/1e3:.1f}KB max={np.max(pngs)/1e3:.1f}KB")
