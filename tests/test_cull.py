"""View-window segment culling (draw/primitives._cull_view).

The device path drops stroke segments whose bbox (with the paint
margin) cannot touch the tile canvas — neighbor-tile geometry leaves
~90% of a 3x3-fetch polyline out of view.  These tests pin that the
cull is output-invariant: the per-segment dense alpha (the model the
device kernels implement, ops/coverage_np.py) restricted to the canvas
is identical with and without culling, and that kept rows preserve
their traveled/outer metadata (dash phases must not shift).
"""

import numpy as np

from osm_renderer_tpu.draw.primitives import (
    make_stroke_prim,
    make_stroke_prims_batch,
)
from osm_renderer_tpu.ops import coverage_np as cov
from osm_renderer_tpu.ops.coverage_np import (
    LINE_CAP_BUTT,
    LINE_CAP_ROUND,
    LINE_CAP_SQUARE,
)

TS = 256


def prim_alpha(prim, ts=TS):
    """Dense per-segment alpha of a StrokePrim's device-path rows:
    fmax over (segs, traveled, outer) exactly as the kernel does."""
    alpha = np.zeros((ts, ts), dtype=np.float64)
    cap_for_dashes = prim.cap if prim.use_caps_for_dashes else LINE_CAP_BUTT
    body = cov.compute_dash_profile(
        prim.half_width, list(prim.dashes) if prim.dashes else None, cap_for_dashes
    )
    outer = cov.compute_dash_profile(prim.half_width, [0.0], prim.cap)
    for i in range(prim.segs.shape[0]):
        x1, y1, x2, y2 = (int(v) for v in prim.segs[i])
        got = cov.stroke_segment_alpha(
            (x1, y1), (x2, y2), prim.half_width, prim.opacity,
            outer if prim.outer[i] else body, float(prim.traveled[i]), ts,
        )
        if got is None:
            continue
        block, (x0, y0, w, h) = got
        region = alpha[y0 : y0 + h, x0 : x0 + w]
        np.fmax(region, block, out=region)
    return alpha


def rand_polyline(rng, span=900):
    n = int(rng.integers(2, 8))
    pts = rng.integers(-span, TS + span, (n, 2))
    return np.array([[*pts[i], *pts[i + 1]] for i in range(n - 1)], dtype=np.int64)


def test_cull_output_invariant_fuzz():
    rng = np.random.default_rng(7)
    caps = [LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE]
    for it in range(40):
        pairs = rand_polyline(rng)
        width = float(rng.choice([0.5, 1.0, 2.5, 7.0]))
        dashes = None if rng.random() < 0.5 else [6.0, 3.0]
        cap = caps[int(rng.integers(0, 3))]
        full = make_stroke_prim(pairs, width, (10, 20, 30), 1.0, dashes, cap, True)
        culled = make_stroke_prim(
            pairs, width, (10, 20, 30), 1.0, dashes, cap, True, view_px=TS
        )
        assert culled.segs.shape[0] <= full.segs.shape[0]
        a = prim_alpha(full)
        b = prim_alpha(culled)
        assert np.array_equal(a, b), f"iter {it}: cull changed painted alpha"


def test_cull_preserves_traveled_and_outer():
    rng = np.random.default_rng(11)
    pairs = rand_polyline(rng)
    full = make_stroke_prim(pairs, 2.0, (0, 0, 0), 1.0, [4.0, 2.0], LINE_CAP_ROUND, True)
    culled = make_stroke_prim(
        pairs, 2.0, (0, 0, 0), 1.0, [4.0, 2.0], LINE_CAP_ROUND, True, view_px=TS
    )
    # Every kept row appears in the full prim with identical metadata.
    full_rows = {
        tuple(full.segs[i]): (full.traveled[i], full.outer[i])
        for i in range(full.segs.shape[0])
    }
    for i in range(culled.segs.shape[0]):
        key = tuple(culled.segs[i])
        assert key in full_rows
        trav, out = full_rows[key]
        assert culled.traveled[i] == trav
        assert culled.outer[i] == out


def test_cull_batch_matches_single():
    rng = np.random.default_rng(13)
    reqs = [
        (rand_polyline(rng), 1.5, (1, 2, 3), 0.8, [5.0, 5.0], LINE_CAP_SQUARE, True)
        for _ in range(6)
    ]
    singles = [make_stroke_prim(*r, view_px=TS) for r in reqs]
    batch = make_stroke_prims_batch(reqs, view_px=TS)
    assert len(singles) == len(batch)
    for s, b in zip(singles, batch):
        assert np.array_equal(s.segs, b.segs)
        assert np.array_equal(s.traveled, b.traveled)
        assert np.array_equal(s.outer, b.outer)


def test_cull_keeps_crossing_segment():
    # A segment whose endpoints are both far outside but which crosses
    # the canvas must be kept.
    pairs = np.array([[-500, -500, 700, 700]], dtype=np.int64)
    p = make_stroke_prim(pairs, 2.0, (0, 0, 0), 1.0, None, LINE_CAP_BUTT, True, view_px=TS)
    assert p.segs.shape[0] == 1
    # And one fully off to the side is dropped.
    pairs = np.array([[-500, 10, -400, 700]], dtype=np.int64)
    p = make_stroke_prim(pairs, 2.0, (0, 0, 0), 1.0, None, LINE_CAP_BUTT, True, view_px=TS)
    assert p.segs.shape[0] == 0
    # raw_pairs stays whole for the oracle path.
    assert p.raw_pairs.shape[0] == 1


def test_stroke_items_cover_paint_windows():
    """Work items (ops/render_pallas._stroke_items) must cover every
    window a segment's paint margin can touch — (8, 128) for
    shallow/dead sections, (16, 64) for steep sections — carry valid
    packed fields, keep sections 4-aligned, and stay within the
    padding bound over _stroke_item_counts (the chunk-split budget)."""
    import numpy as np

    from osm_renderer_tpu.ops.render_pallas import (
        RB16,
        RB_I,
        _stroke_item_counts,
        _stroke_items,
    )

    rng = np.random.default_rng(5)
    ts = 256
    for _ in range(50):
        n = int(rng.integers(1, 60))
        g = rng.integers(-300, ts + 300, (n, 4)).astype(np.int64)
        if rng.random() < 0.5:
            # force some axis-aligned segments
            g[: n // 2, 2] = g[: n // 2, 0]
        hw = float(rng.choice([0.25, 0.5, 1.0, 3.0]))
        items, isec = _stroke_items(g, hw, ts)
        counts = _stroke_item_counts(g, hw, ts)
        live = items[items >= 0]
        # Sections pad with DUPLICATE items (re-evaluation is a no-op
        # under the fmax emit): shallow/dead pad to a 4-multiple (<= 3
        # each); steep sections interleave two sub-half lists padded to
        # a common even length (at most doubling + 2).
        assert counts.sum() <= len(live) <= 2 * counts.sum() + 4 * len(isec)
        assert (isec[1:] >= isec[:-1]).all() if len(isec) > 1 else True
        assert isec[11] == len(items)
        # every section boundary is 4-aligned
        assert all(int(v) % 4 == 0 for v in isec)
        # decode and verify each live item window intersects its
        # segment's margin y-extent, per section geometry
        m = int(np.ceil(hw)) + 1
        bounds = [0] + [int(v) for v in isec]
        for slot in range(12):
            sec = items[bounds[slot] : bounds[slot + 1]]
            sec = sec[sec >= 0]
            if not len(sec):
                continue
            rowb = RB16 if 4 <= slot < 8 else RB_I
            sg = sec & 127
            rblk = (sec >> 8) & 63
            x1, y1, x2, y2 = g[sg, 0], g[sg, 1], g[sg, 2], g[sg, 3]
            ylo = np.clip(np.minimum(y1, y2) - m, 0, ts - 1)
            yhi = np.clip(np.maximum(y1, y2) + m, 0, ts - 1)
            assert (
                (rblk * rowb <= yhi)
                & (rblk * rowb + rowb - 1 >= ylo // rowb * rowb)
            ).all()
            nondeg = ~((x1 == x2) & (y1 == y2))
            assert nondeg.all()
            if 4 <= slot < 8:
                # steep sections: |dy| > |dx| and sub-half bit present
                assert (np.abs(y2 - y1) > np.abs(x2 - x1)).all()
                assert ((sec >> 14) <= 1).all()
