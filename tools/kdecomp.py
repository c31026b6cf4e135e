#!/usr/bin/env python
"""Device-kernel cost decomposition: time the z15 batch with chunk
classes PAD-ed out (kind is runtime data — same executable, no
recompile), isolating step floor / fills / per-segment strokes /
work-item strokes.  Usage:

    python tools/kdecomp.py [--reps 16] [--zoom 15] [--geodata assets/fixtures/bigcity.bin]
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

    kind = np.asarray(prep.batch.kind)
    items = np.asarray(prep.batch.items)
    cnt = np.asarray(prep.batch.cnt)
    n_chunks = kind.shape[0]
    names = {
        rp.KIND_PAD: "pad", rp.KIND_FILL: "fill", rp.KIND_STROKE: "stroke_seg",
        rp.KIND_STROKE_SOLID: "solid",
        rp.KIND_FILL_IMAGE: "fill_image", rp.KIND_LAYER: "layer",
        rp.KIND_STROKE_DASH: "dash_item",
    }
    print(f"chunks: {n_chunks} total over {n} tiles")
    for k in sorted(names):
        m = kind == k
        if m.any():
            n_items = int((items[m] >= 0).sum())
            print(f"  {names[k]:>15}: {int(m.sum()):5d} chunks, "
                  f"cnt sum {int(cnt[m].sum()):6d}, items {n_items}")

    ITEM_KINDS = (rp.KIND_STROKE_SOLID, rp.KIND_STROKE_DASH)

    def variant(name, keep):
        nk = kind.copy()
        drop = ~np.isin(nk, keep) & (nk != rp.KIND_PAD)
        nk[drop] = rp.KIND_PAD
        return name, nk

    isec = np.asarray(prep.batch.isec)
    item_chunks = np.isin(kind, ITEM_KINDS)
    shallow_items = int(isec[item_chunks, 3].sum())
    steep_items = int((isec[item_chunks, 7] - isec[item_chunks, 3]).sum())
    dead_items = int((isec[item_chunks, 11] - isec[item_chunks, 7]).sum())
    print(f"items: shallow {shallow_items}, steep16 {steep_items}, dead {dead_items}")

    # shallow-only: empty the steep/dead sections (slots 4..11 end at isec[3])
    isec_axis = isec.copy()
    isec_axis[:, 4:] = isec_axis[:, 3:4]
    # shallow+steep: empty the dead sections
    isec_ad = isec.copy()
    isec_ad[:, 8:] = isec_ad[:, 7:8]
    # last zeroed: no per-primitive blends (floor = steps+init+finalize)
    last0 = np.zeros_like(np.asarray(prep.batch.last))

    variants = [
        ("full", kind.copy(), None, None),
        ("floor_only", variant("", ())[1], None, None),
        ("steps_only", variant("", ())[1], None, last0),
        ("fills_only", variant("", (rp.KIND_FILL, rp.KIND_FILL_IMAGE, rp.KIND_LAYER))[1], None, None),
        ("items_only", variant("", ITEM_KINDS)[1], None, None),
        ("items_shallow", variant("", ITEM_KINDS)[1], isec_axis, None),
        ("items_shallow_steep", variant("", ITEM_KINDS)[1], isec_ad, None),
        ("seg_stroke_only", variant("", (rp.KIND_STROKE,))[1], None, None),
    ]

    for name, nk, nisec, nlast in variants:
        b = prep.batch._replace(kind=jnp.asarray(nk))
        if nisec is not None:
            b = b._replace(isec=jnp.asarray(nisec))
        if nlast is not None:
            b = b._replace(last=jnp.asarray(nlast))
        p = prep._replace(batch=b)
        out = dev.render_prepared_planar(p)
        out.block_until_ready()
        ps = []
        for i in range(args.reps):
            color = np.asarray(p.batch.color) * (1.0 - 1e-4 * (i + 1))
            ps.append(p._replace(batch=p.batch._replace(color=jnp.asarray(color))))
        jax.block_until_ready([q.batch.color for q in ps])
        t0 = time.perf_counter()
        outs = [dev.render_prepared_planar(q) for q in ps]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:>16}: {dt*1e3:7.2f} ms/batch  ({n/dt:7.0f} t/s)")


if __name__ == "__main__":
    main()
