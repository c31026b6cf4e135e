"""Precompile the serving kernel signatures for a geodata file.

First compiles of the Pallas kernel can take minutes (per distinct
(n_tiles bucket, chunk-count bucket) signature); running this once after
an import populates the persistent JAX compile cache so the tile server
answers its first requests at full speed.

Usage:
    python tools/warmup.py GEODATA.bin STYLESHEET.mapcss [--scales 1,2]
        [--zooms 13,14,15,16] [--buckets 4,8,16,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_renderer_tpu.utils.jax_setup import setup_jax


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("geodata")
    ap.add_argument("stylesheet")
    ap.add_argument("--scales", default="1")
    ap.add_argument("--zooms", default="13,15,17")
    ap.add_argument("--buckets", default="4,8,16,32")
    args = ap.parse_args(argv)

    setup_jax()
    import jax

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = GeodataReader.load(args.geodata)
    base, name = os.path.split(args.stylesheet)
    styler = Styler(parse_file(base, name), "josm")
    renderer = BatchRenderer(
        styler,
        backend="pallas",
        interpret=jax.default_backend() != "tpu",
        stylesheet_dir=base,
        tile_bucket=True,
    )

    if reader.tiles.shape[0] == 0:
        print("geodata has no tile index entries; nothing to warm")
        return 0

    scales = [int(s) for s in args.scales.split(",")]
    zooms = [int(z) for z in args.zooms.split(",")]
    buckets = sorted({int(b) for b in args.buckets.split(",")})

    for scale in scales:
        for zoom in zooms:
            shift = 18 - zoom
            tx = reader.tiles["x"] >> shift
            ty = reader.tiles["y"] >> shift
            coords = sorted(set(zip(tx.tolist(), ty.tolist())))
            for bucket in buckets:
                tiles = [Tile(zoom, x, y) for x, y in coords[:bucket]]
                if not tiles:
                    continue
                te = [
                    (reader.get_entities_in_tile_with_neighbors(t), t)
                    for t in tiles
                ]
                t0 = time.perf_counter()
                prepared = renderer.prepare(te, scale)
                out = renderer.render_prepared(prepared)
                out.block_until_ready()
                print(
                    f"warmed scale={scale} zoom={zoom} tiles<={bucket} "
                    f"(batch {prepared.chunk}, chunks {prepared.batch.kind.shape[0]}) "
                    f"in {time.perf_counter() - t0:.1f}s"
                )
    print("warmup complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
