#!/usr/bin/env python
"""Real-extract-scale serving sweep on hardware (BASELINE config-5 analogue).

Generates (once) a city fixture sized like a real metro extract
(--blocks 112 => ~500+ z15 tiles, ~5x the bench corpus), then serves a
shuffled multi-batch z12-z17 sweep through the production TileService
with a deliberately small chunk cache, so arena eviction, free-list
coalescing, generation guards and MAX_BATCH_CHUNKS splits all fire on
the live path at scale — the regime where the reference is trivially
flat (`reader.rs:60-100` is size-independent).

Reports sustained throughput per pass (cold / warm-capacity-pressured)
plus arena invariants.  Pixel correctness at this scale is asserted by
tests/test_scale_pressure.py (interpret mode); this tool is the
hardware throughput leg recorded in BASELINE.md.

Usage: python tools/scale_sweep.py [--blocks 112] [--cache-tiles 160]
"""
import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=112)
    ap.add_argument("--cache-tiles", type=int, default=160,
                    help="chunk-cache tiles (<< corpus so eviction fires)")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--labels", action="store_true")
    args = ap.parse_args()

    osm = os.path.join(REPO, "assets", "fixtures", f"hugecity{args.blocks}.osm")
    binf = osm[:-4] + ".bin"
    if not os.path.exists(binf):
        if not os.path.exists(osm):
            import subprocess

            t0 = time.perf_counter()
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "make_fixture.py"),
                 osm, "--blocks", str(args.blocks)],
                check=True,
            )
            print(f"fixture gen: {time.perf_counter()-t0:.1f} s")
        from osm_renderer_tpu.geodata.importer import import_osm

        t0 = time.perf_counter()
        import_osm(osm, binf)
        print(f"import: {time.perf_counter()-t0:.1f} s")

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.server.http import TileService

    reader = GeodataReader.load(binf)
    sdir = os.path.join(REPO, "assets", "stylesheets")
    styler = Styler(parse_file(sdir, "default.mapcss"), "josm")

    tiles = []
    per_zoom = {}
    for zoom in (12, 13, 14, 15, 16, 17):
        sh = 18 - zoom
        zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                            (reader.tiles["y"] >> sh).tolist())))
        cap = {12: 16, 13: 32, 14: 128, 16: 128, 17: 128}.get(zoom)
        if cap and len(zt) > cap:
            step = len(zt) // cap
            zt = zt[::step][:cap]
        per_zoom[zoom] = len(zt)
        tiles += [Tile(zoom, x, y) for x, y in zt]
    print(f"corpus: {per_zoom} = {len(tiles)} tiles "
          f"(cache {args.cache_tiles} tiles => eviction pressure "
          f"{len(tiles)/args.cache_tiles:.1f}x)")

    svc = TileService(binf, styler, sdir, backend="device",
                      enable_labels=args.labels, png_level=1)
    svc.batch_renderer.chunk_cache_tiles = args.cache_tiles

    rng = random.Random(0)
    sizes = {}
    for name in ("cold", "warm1", "warm2"):
        order = list(tiles)
        rng.shuffle(order)
        t0 = time.perf_counter()
        n = 0
        for s in range(0, len(order), args.batch):
            batch = order[s : s + args.batch]
            pngs = svc.render_tiles_device([(t, 1) for t in batch])
            for t, p in zip(batch, pngs):
                assert p[:8] == b"\x89PNG\r\n\x1a\n", t
                sizes[(name, t.zoom, t.x, t.y)] = len(p)
            n += len(batch)
        dt = time.perf_counter() - t0
        print(f"{name:6s} {n} tiles in {dt:6.2f} s -> {n/dt:7.1f} t/s")

    # Arena invariants after the full churn (same checks as the test).
    arena = svc.batch_renderer.chunk_arena
    if arena is not None:
        live = sum(nn for _, nn in arena._offsets.values())
        free = sum(nn for _, nn in arena._free)
        ok = live + free == arena._tail - 1
        print(f"arena: cap={arena.cap} live={live} free={free} "
              f"tail={arena._tail} freelist={len(arena._free)} "
              f"no-leak={'OK' if ok else 'LEAK'}")
        assert ok
    # Warm passes must serve identical bytes (same container, steady
    # state) — a cheap scale-level determinism check.
    mismatch = sum(
        1
        for k, v in sizes.items()
        if k[0] == "warm2" and sizes.get(("warm1",) + k[1:]) != v
    )
    print(f"warm1-vs-warm2 size mismatches: {mismatch} (expect 0)")


if __name__ == "__main__":
    main()
