#!/usr/bin/env python
"""Per-stage breakdown of COLD tile assembly (VERDICT r4 item 8).

Cold serving pays full host assembly per tile (~ms each) where warm
serving concatenates cached chunks (~us each).  This walks every z15
tile of the minicity corpus with empty caches and prints where the
cold milliseconds sit, using the same span-tree profiler the server
exposes at /perf_stats (reference: perf_stats/real_impl.rs aggregation
over drawer.rs measure points):

  Fetch entities   reader.get_entities_in_tile_with_neighbors (3x3)
  Style areas      MapCSS cascade (cold style cache)
  Project nodes    id dedup + f64 Mercator -> i64 pixel snap
  Build requests   styled rows -> flat request arrays (Python)
  Native assemble  C++ osmr_assemble_tile (spans/items/tent lanes)
  Pack chunks      output copies + group padding

Usage: python tools/cold_profile.py [--reps N] [--stylesheet PATH]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer
from osm_renderer_tpu.perfstats import spans as perfstats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bin", default="assets/fixtures/minicity.bin")
    ap.add_argument("--stylesheet", default="assets/stylesheets/default.mapcss")
    ap.add_argument("--style-type", default=None, help="josm|mapsme")
    args = ap.parse_args()

    reader = GeodataReader.load(args.bin)
    base, name = os.path.split(args.stylesheet)
    stype = args.style_type or ("mapsme" if "osmosnimki" in name else "josm")

    tx = reader.tiles["x"] >> 3
    ty = reader.tiles["y"] >> 3
    tiles = [
        Tile(15, x, y) for x, y in sorted(set(zip(tx.tolist(), ty.tolist())))
    ]
    n = len(tiles)

    from osm_renderer_tpu.draw.native_assembler import (
        assemble_tile_chunks_native,
    )

    stats = perfstats.PerfStats()
    wall = 0.0
    prep_cold = 0.0
    for rep in range(args.reps):
        # Fresh styler + renderer per rep: cold means cold style cache,
        # cold chunk cache, cold profile/pattern tables.
        styler = Styler(parse_file(base, name), stype)
        dev = BatchRenderer(
            styler, backend="pallas", chunk_cache_tiles=256, arena=True,
            stylesheet_dir=base,
        )
        profiles, patterns = dev._tables_for(1)
        t0 = time.perf_counter()
        for t in tiles:
            perfstats.start_tile(t.zoom)
            with perfstats.measure("Fetch entities"):
                ents = reader.get_entities_in_tile_with_neighbors(t)
            with perfstats.measure("Assemble"):
                assemble_tile_chunks_native(
                    ents, t, 1.0, styler, profiles, patterns, 256
                )
            perfstats.finish_tile(stats)
        wall += time.perf_counter() - t0
        # Batch-level remainder (fresh renderer, cold style cache kept
        # warm by the pass above): prepare = assembly + arena insert +
        # concat + upload; serving streams this in 16-tile sub-batches.
        # One throwaway prepare first: arena/slab insert jits and
        # first-touch numpy imports are once-per-process, not per-tile.
        dev2 = BatchRenderer(
            styler, backend="pallas", chunk_cache_tiles=256, arena=True,
            stylesheet_dir=base,
        )
        te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
        dev2.prepare(te, scale=1)
        dev2.cache_clear()
        t0 = time.perf_counter()
        dev2.prepare(te, scale=1)
        prep_cold += time.perf_counter() - t0

    root = stats.by_zoom[15]
    count = stats.tile_counts[15]
    print(f"cold assembly, {count} tile renders ({args.reps} reps x {n} tiles)")
    print(f"  total wall        {1e3 * wall / count:8.3f} ms/tile")
    print(
        f"  full cold prepare {1e3 * prep_cold / count:8.3f} ms/tile "
        f"(warm style cache; + arena insert/concat/upload)"
    )

    def walk(node, depth):
        for ch in node.children.values():
            print(
                f"  {'  ' * depth}{ch.name:<18}{1e3 * ch.total / count:8.3f} "
                f"ms/tile ({100.0 * ch.total / root.total:.1f}%)"
            )
            walk(ch, depth + 1)

    walk(root, 0)


if __name__ == "__main__":
    main()
