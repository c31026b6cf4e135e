#!/usr/bin/env python
"""Per-stage timing of the exact warm RLE serving loop bench.py runs.

Stages per batch: prepare (cache concat + h2d), rle dispatch,
wire wait+fetch (d2h), native decode, png encode.  Prints ms/batch.
"""
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

ARENA = os.environ.get("OSMR_ARENA", "1") == "1"
dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256, arena=ARENA)
prepared = dev.prepare(te, scale=1)   # cold: fills cache
dev.fetch_rgb_rle(dev.render_prepared_rle(prepared))
dev.fetch_rgb_rle(dev.render_prepared_rle(prepared))

te_none = [(None, t) for t in tiles]

REPS = 6
stages = {k: [] for k in ("prepare", "dispatch", "fetch", "png", "total")}
for it in range(REPS):
    t0 = time.perf_counter()
    p = dev.prepare(te_none, scale=1)
    t1 = time.perf_counter()
    r = dev.render_prepared_rle(p)
    try:
        r.wire.copy_to_host_async()
    except Exception:
        pass
    t2 = time.perf_counter()
    rgb = dev.fetch_rgb_rle(r)
    t3 = time.perf_counter()
    pngs = [rgb_to_png(rgb[i], 1) for i in range(n)]
    t4 = time.perf_counter()
    stages["prepare"].append(t1 - t0)
    stages["dispatch"].append(t2 - t1)
    stages["fetch"].append(t3 - t2)
    stages["png"].append(t4 - t3)
    stages["total"].append(t4 - t0)

for k, v in stages.items():
    ms = [f"{x*1e3:7.1f}" for x in v]
    print(f"{k:9s} {' '.join(ms)}   median {sorted(v)[len(v)//2]*1e3:7.1f} ms")
print(f"n={n} tiles; median total -> {n/sorted(stages['total'])[REPS//2]:.1f} t/s (unpipelined)")

if not ARENA:
    # Break prepare down: concat vs h2d
    from osm_renderer_tpu.ops import render_pallas as RP
    import jax.numpy as jnp

    profiles, patterns = dev._tables_for(1)
    chunks = []
    for t in tiles:
        key = (t.zoom, t.x, t.y, 1)
        chunks.append(dev._chunk_cache[key][0])
    t0 = time.perf_counter()
    pb = RP.concat_pallas_batch(chunks, profiles, 256, patterns)
    t1 = time.perf_counter()
    pb2 = RP.PallasBatch(*(jnp.asarray(a) for a in pb))
    jax.block_until_ready(list(pb2))
    t2 = time.perf_counter()
    print(f"concat {1e3*(t1-t0):.1f} ms  h2d+wait {1e3*(t2-t1):.1f} ms")
    sizes = {f: np.asarray(a).nbytes for f, a in zip(RP.PallasBatch._fields, pb)}
    tot = sum(sizes.values())
    print(f"batch bytes: {tot/1e6:.2f} MB  " + "  ".join(f"{k}={v/1e3:.0f}K" for k, v in sorted(sizes.items(), key=lambda x: -x[1])[:8]))
else:
    p = dev.prepare(te_none, scale=1)
    print(f"arena packed upload: {p.arena_packed.nbytes/1e3:.1f} KB  IT={p.arena_it}")

# fetch breakdown: wire wait vs decode
r = dev.render_prepared_rle(dev.prepare(te_none, scale=1))
t0 = time.perf_counter()
wire = np.asarray(r.wire)
t1 = time.perf_counter()
rgb = dev.fetch_rgb_rle(r)
t2 = time.perf_counter()
print(f"wire d2h {1e3*(t1-t0):.1f} ms ({wire.nbytes/1e3:.0f} KB)  decode(+refetch) {1e3*(t2-t1):.1f} ms")
