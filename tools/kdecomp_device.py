#!/usr/bin/env python
"""TRUE-device-time chunk-class decomposition of the render kernel.

kdecomp.py variants measured with wall-clock rep loops fold ~2.4 ms of
host dispatch/sync amortization per batch into every line (and box
contention adds more), which makes small deltas unreadable.  This runs
the same PAD-out variants (kind is runtime data -> same executable)
but times each with a profiler trace, reporting summed on-device
duration of the pallas program only (tools/kdevice.py technique).

Usage: python tools/kdecomp_device.py [--reps 8] [--zoom 15]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

from kdevice import device_ms_per_call  # noqa: E402  (tools/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--zoom", type=int, default=15)
    ap.add_argument("--geodata", default="assets/fixtures/bigcity.bin")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer
    from osm_renderer_tpu.ops import render_pallas as rp

    reader = GeodataReader.load(args.geodata)
    styler = Styler(parse_file("assets/stylesheets", "default.mapcss"), "josm")
    sh = 18 - args.zoom
    zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                        (reader.tiles["y"] >> sh).tolist())))
    tiles = [Tile(args.zoom, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    n = len(te)

    dev = BatchRenderer(styler, backend="pallas")
    prep = dev.prepare(te, scale=1)
    kind0 = np.asarray(prep.batch.kind)
    items0 = np.asarray(prep.batch.items)

    FILLS = (rp.KIND_FILL,)
    SEG = (rp.KIND_STROKE,)
    ITEMS = (rp.KIND_STROKE_SOLID, rp.KIND_STROKE_DASH)
    SPANS = (rp.KIND_STROKE_SPAN,)
    LAYERS = (rp.KIND_LAYER,)

    def variant(keep, name, no_items=False):
        kind = kind0.copy()
        mask = ~np.isin(kind, np.asarray(keep, kind.dtype))
        kind[mask & (kind != rp.KIND_PAD)] = rp.KIND_PAD
        b = prep.batch._replace(kind=jnp.asarray(kind))
        if no_items:
            b = b._replace(items=jnp.asarray(np.full_like(items0, -1)))
        p = prep._replace(batch=b)
        dev.render_prepared_planar(p).block_until_ready()
        ps = []
        c0 = np.asarray(prep.batch.color)
        for i in range(args.reps):
            ps.append(p._replace(batch=p.batch._replace(
                color=jnp.asarray(c0 * (1.0 - 1e-4 * (i + 1))))))
        jax.block_until_ready([q.batch.color for q in ps])
        tdir = tempfile.mkdtemp(prefix="kdd_")
        with jax.profiler.trace(tdir):
            outs = [dev.render_prepared_planar(q) for q in ps]
            jax.block_until_ready(outs)
        ms = device_ms_per_call(tdir, args.reps)["device_ms_per_call"]
        print(f"{name:>16}: {ms:7.3f} ms device ({n} tiles, {n/ms*1e3:7.0f} t/s)")
        return ms

    all_kinds = tuple(int(k) for k in np.unique(kind0))
    variant(all_kinds, "full")
    variant((), "floor_only", no_items=True)
    variant(FILLS, "fills_only")
    variant(SPANS, "spans_only")
    variant(ITEMS, "items_only")
    variant(SEG, "seg_only")
    variant(LAYERS, "layers_only")


if __name__ == "__main__":
    main()
