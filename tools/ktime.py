#!/usr/bin/env python
"""Quick device-kernel timing: z15 batch over the minicity fixture.

Prints ms/batch and tiles/s for the Pallas device path only (no e2e),
for fast iteration on kernel changes.  Usage:

    python tools/ktime.py [--reps 16] [--zoom 15]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--zoom", type=int, default=15)
    ap.add_argument("--geodata", default="assets/fixtures/minicity.bin")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = GeodataReader.load(args.geodata)
    styler = Styler(parse_file("assets/stylesheets", "default.mapcss"), "josm")

    sh = 18 - args.zoom
    zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                        (reader.tiles["y"] >> sh).tolist())))
    tiles = [Tile(args.zoom, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    n = len(te)

    dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256)
    prep = dev.prepare(te, scale=1)
    out = dev.render_prepared(prep)
    out.block_until_ready()

    preps = []
    for i in range(args.reps):
        color = np.asarray(prep.batch.color) * (1.0 - 1e-4 * (i + 1))
        preps.append(prep._replace(batch=prep.batch._replace(color=jnp.asarray(color))))
    jax.block_until_ready([p.batch.color for p in preps])

    t0 = time.perf_counter()
    outs = [dev.render_prepared(p) for p in preps]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / args.reps

    print(f"z{args.zoom}: {n} tiles, {dt*1e3:.2f} ms/batch, {n/dt:.0f} tiles/s")


if __name__ == "__main__":
    main()
