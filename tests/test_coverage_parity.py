"""Pixel parity: dense numpy coverage model vs the C++ oracle rasterizer.

The oracle (native/oracle.cpp) replicates the reference's sequential
rasterizers; the dense model (ops/coverage_np.py) is the closed-form
data-parallel reformulation that the TPU kernels implement.  These tests
require exact u8 output equality on randomized scenes.
"""

import numpy as np
import pytest

from osm_renderer_tpu.draw.oracle import (
    LINE_CAP_BUTT,
    LINE_CAP_ROUND,
    LINE_CAP_SQUARE,
    OracleTile,
)
from osm_renderer_tpu.ops import coverage_np as cov

TS = 256
CANVAS = (241, 238, 232)


def oracle_render(prims, ts_scale=1):
    tile = OracleTile(ts_scale)
    tile.reset(CANVAS)
    for p in prims:
        if p["kind"] == "fill":
            tile.fill_contour(p["edges"], p["color"], p["opacity"])
        else:
            tile.draw_lines(
                p["pairs"], p["width"], p["color"], p["opacity"],
                p.get("dashes"), p.get("cap", LINE_CAP_BUTT),
                p.get("use_caps_for_dashes", True),
            )
        tile.bump_generation()
    tile.blend_unfinished(False)
    tile.blend_unfinished(True)
    return tile.to_rgb()


def dense_render(prims, ts=TS):
    base = np.zeros((ts, ts, 4), dtype=np.float64)
    base[..., :3] = np.array(CANVAS, dtype=np.float64) / 255.0
    base[..., 3] = 1.0
    for p in prims:
        if p["kind"] == "fill":
            alpha = cov.fill_alpha(p["edges"], p["opacity"], ts)
        else:
            alpha = cov.polyline_stroke_alpha(
                p["pairs"], p["width"] / 2.0, p["opacity"], p.get("dashes"),
                p.get("cap", LINE_CAP_BUTT), p.get("use_caps_for_dashes", True), ts,
            )
        cov.blend_src_over(base, alpha, p["color"])
    return cov.rgba_to_rgb_u8(base)


def assert_parity(prims, context=""):
    a = oracle_render(prims)
    b = dense_render(prims)
    diff = np.abs(a.astype(int) - b.astype(int))
    if diff.max() > 0:
        ys, xs, _ = np.nonzero(diff)
        k = (ys[0], xs[0])
        raise AssertionError(
            f"{context}: {int((diff > 0).sum())} differing channel(s), max {diff.max()}; "
            f"first at {k}: oracle={a[k]} dense={b[k]}"
        )


def rand_color(rng):
    return tuple(int(v) for v in rng.integers(0, 256, 3))


def make_polygon(rng, closed=True):
    n = int(rng.integers(3, 9))
    cx, cy = rng.integers(20, TS - 20, 2)
    radius = rng.integers(5, 60)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    xs = (cx + radius * np.cos(angles)).astype(np.int64)
    ys = (cy + radius * np.sin(angles)).astype(np.int64)
    pts = list(zip(xs, ys))
    if closed:
        pts.append(pts[0])
    return np.array(
        [[pts[i][0], pts[i][1], pts[i + 1][0], pts[i + 1][1]] for i in range(len(pts) - 1)],
        dtype=np.int64,
    )


def make_polyline(rng, n_max=6, lo=-40, hi=TS + 40):
    n = int(rng.integers(2, n_max))
    pts = rng.integers(lo, hi, (n, 2))
    return np.array(
        [[*pts[i], *pts[i + 1]] for i in range(n - 1)], dtype=np.int64
    )


def test_fill_parity_random():
    rng = np.random.default_rng(42)
    for trial in range(30):
        prims = [
            {"kind": "fill", "edges": make_polygon(rng), "color": rand_color(rng),
             "opacity": float(rng.choice([1.0, 0.8, 0.5]))}
            for _ in range(int(rng.integers(1, 6)))
        ]
        assert_parity(prims, f"fill trial {trial}")


def test_fill_parity_open_and_hole():
    rng = np.random.default_rng(7)
    # Open contour (unclosed way with fill) + ring with hole in one edge list.
    outer = make_polygon(rng)
    inner = make_polygon(rng)
    both = np.concatenate([outer, inner])
    prims = [
        {"kind": "fill", "edges": make_polygon(rng, closed=False),
         "color": (10, 200, 30), "opacity": 1.0},
        {"kind": "fill", "edges": both, "color": (30, 60, 200), "opacity": 0.9},
    ]
    assert_parity(prims, "open/hole fills")


def test_stroke_parity_solid():
    rng = np.random.default_rng(3)
    for trial in range(30):
        prims = [
            {"kind": "stroke", "pairs": make_polyline(rng),
             "width": float(rng.choice([0.5, 1.0, 1.5, 2.0, 3.0, 7.0, 14.0])),
             "color": rand_color(rng), "opacity": float(rng.choice([1.0, 0.6]))}
            for _ in range(int(rng.integers(1, 5)))
        ]
        assert_parity(prims, f"solid stroke trial {trial}")


def test_stroke_parity_dashes_and_caps():
    rng = np.random.default_rng(11)
    dash_choices = [[6.0, 3.0], [2.0, 2.0], [10.0, 4.0, 2.0, 4.0], [1.0, 1.0]]
    for trial in range(30):
        prims = []
        for _ in range(int(rng.integers(1, 4))):
            prims.append({
                "kind": "stroke", "pairs": make_polyline(rng),
                "width": float(rng.choice([1.0, 2.5, 5.0, 9.0])),
                "color": rand_color(rng), "opacity": 1.0,
                "dashes": dash_choices[int(rng.integers(0, len(dash_choices)))],
                "cap": int(rng.choice([LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE])),
                "use_caps_for_dashes": bool(rng.integers(0, 2)),
            })
        assert_parity(prims, f"dash trial {trial}")


def test_stroke_far_offscreen_geometry():
    # Segments with far-away endpoints (the long-way case at high zoom).
    prims = [
        {"kind": "stroke",
         "pairs": np.array([[-100000, 128, 300000, 131]], dtype=np.int64),
         "width": 5.0, "color": (200, 40, 40), "opacity": 1.0},
        {"kind": "stroke",
         "pairs": np.array([[128, -50000, 131, 70000]], dtype=np.int64),
         "width": 3.0, "color": (40, 40, 200), "opacity": 1.0,
         "dashes": [8.0, 4.0], "cap": LINE_CAP_ROUND},
        {"kind": "stroke",
         "pairs": np.array([[-5000, -5000, 6000, 5500]], dtype=np.int64),
         "width": 4.0, "color": (40, 200, 40), "opacity": 0.8},
    ]
    assert_parity(prims, "far geometry")


def test_mixed_scene():
    rng = np.random.default_rng(99)
    prims = []
    for _ in range(6):
        prims.append({"kind": "fill", "edges": make_polygon(rng),
                      "color": rand_color(rng), "opacity": 1.0})
    for _ in range(6):
        prims.append({"kind": "stroke", "pairs": make_polyline(rng),
                      "width": float(rng.choice([1.0, 3.0, 6.0])),
                      "color": rand_color(rng), "opacity": 1.0,
                      "dashes": [5.0, 3.0], "cap": LINE_CAP_ROUND})
    assert_parity(prims, "mixed scene")


def test_long_segment_chain_classes_512():
    """Byte-exact parity on the walk-chain stress class: long segments
    (endpoints beyond the canvas) on a 512 canvas, every cap kind, wide
    round-capped dashes included."""
    rng = np.random.default_rng(77)
    ts = 512
    for trial in range(40):
        p1 = rng.integers(-100, ts + 100, 2)
        p2 = rng.integers(-100, ts + 100, 2)
        if (p1 == p2).all():
            continue
        pairs = np.array([[p1[0], p1[1], p2[0], p2[1]]], dtype=np.int64)
        w = float(rng.choice([1.0, 3.0, 6.0, 11.0, 16.0]))
        dashes = [None, [12.0, 6.0], [3.0, 2.0]][int(rng.integers(0, 3))]
        cap = int(rng.choice([LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE]))

        tile = OracleTile(2)
        tile.reset(CANVAS)
        tile.draw_lines(pairs, w, (255, 255, 255), 1.0, dashes, cap, True)
        tile.bump_generation()
        tile.blend_unfinished(False)
        tile.blend_unfinished(True)
        want = tile.to_rgb()

        base = np.zeros((ts, ts, 4))
        base[..., :3] = np.array(CANVAS, dtype=np.float64) / 255.0
        base[..., 3] = 1.0
        alpha = cov.polyline_stroke_alpha(pairs, w / 2.0, 1.0, dashes, cap, True, ts)
        cov.blend_src_over(base, alpha, (255, 255, 255))
        dense = cov.rgba_to_rgb_u8(base)
        assert np.array_equal(want, dense), (
            trial, tuple(p1), tuple(p2), w, dashes, cap,
            int(np.abs(want.astype(int) - dense.astype(int)).max()),
        )
