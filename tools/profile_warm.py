#!/usr/bin/env python
"""Per-stage profile of the warm serving loop (VERDICT r2 item 3).

Breaks one warm batch into: cache fetch + concat (host numpy),
host->device transfer (jnp.asarray per field), dispatch, device wait,
readback, PNG encode.  Prints a stage table in ms per 30-tile batch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer
from osm_renderer_tpu.ops import render_pallas as RP
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
prepared = dev.prepare(te, scale=1)   # cold: fills cache
out = dev.render_prepared(prepared)
out.block_until_ready()

te_none = [(None, t) for t in tiles]


def timeit(f, reps=8):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) / reps * 1e3


# Stage 1: prepare full (cache hit path)
ms_prepare = timeit(lambda: dev.prepare(te_none, scale=1))

# Stage 1a: concat only (host numpy), no jnp.asarray
profiles, patterns = dev._tables_for(1)
chunks_list = [dev._chunk_cache[(t.zoom, t.x, t.y, 1)][0] for t in tiles]
ms_concat = timeit(lambda: RP.concat_pallas_batch(chunks_list, profiles, 256, patterns))

# Stage 1b: host->device transfer of the concatenated arrays
pb_host = RP.concat_pallas_batch(chunks_list, profiles, 256, patterns)
nbytes = sum(np.asarray(a).nbytes for a in pb_host)


def xfer():
    arrs = RP.PallasBatch(*(jnp.asarray(a) for a in pb_host))
    jax.block_until_ready(list(arrs))


ms_xfer = timeit(xfer)

# Stage 2: dispatch+wait on a resident prepared batch
p = dev.prepare(te_none, scale=1)


def disp():
    r = dev.render_prepared(p)
    r.block_until_ready()


ms_render = timeit(disp)

# Stage 3: readback
r = dev.render_prepared(p)
r.block_until_ready()
ms_readback = timeit(lambda: np.asarray(jax.device_get(r)))
out_bytes = np.asarray(r).nbytes

# Stage 4: PNG
imgs = np.asarray(r)
ms_png = timeit(lambda: [rgb_to_png(imgs[i], 1) for i in range(n)], reps=4)

# Full warm e2e single-threaded, no pipelining
def full():
    p = dev.prepare(te_none, scale=1)
    r = dev.render_prepared(p)
    imgs = np.asarray(r)
    [rgb_to_png(imgs[i], 1) for i in range(n)]


ms_full = timeit(full, reps=4)

print(f"n_tiles={n}  batch_bytes_in={nbytes/1e6:.2f}MB  out={out_bytes/1e6:.2f}MB")
print(f"prepare(full, cache-hit) : {ms_prepare:8.2f} ms")
print(f"  concat only (numpy)    : {ms_concat:8.2f} ms")
print(f"  h2d transfer           : {ms_xfer:8.2f} ms")
print(f"render dispatch+wait     : {ms_render:8.2f} ms")
print(f"readback d2h             : {ms_readback:8.2f} ms")
print(f"png encode x{n}          : {ms_png:8.2f} ms")
print(f"FULL warm loop           : {ms_full:8.2f} ms  ({n/ms_full*1e3:.1f} t/s)")
