"""Fuzz the Rust-transcribed glyph rasterizer spec
(tests/glyph_rasterizer_spec.py) against the production C++ oracle
glyph path (native/oracle.cpp GlyphRasterizer).

Closes the two-independent-implementations loop for text (VERDICT r3
missing #2): fills and strokes already have executable specs; the text
path's only ground truth was the oracle, written by the same builder
from the same Rust (`/root/reference/src/draw/font/rasterizer.rs:27-148`).
Here the spec is a literal transcription (per-stripe trapezoidal areas,
winding deltas, 1.0001 chord-length quad flattening, min(a+sum s, 1)
emission) fuzzed over random outlines and real font glyphs; a shared
misreading would diverge either between the two implementations or
against the geometry-only supersampling check, which depends on
neither.
"""

import math
import random

import numpy as np
import pytest

from osm_renderer_tpu.draw.labels.font import (
    CURVE_TO,
    LINE_TO,
    MOVE_TO,
    FontEngine,
)
from osm_renderer_tpu.draw.oracle import GlyphRasterizer

from tests.glyph_rasterizer_spec import GlyphSpec

FONT_PATH = "assets/fonts/NotoSans-Regular.ttf"


def _both():
    return GlyphSpec(), GlyphRasterizer((0, 0, 0))


def _draw_segments(spec, oracle, segments):
    for seg in segments:
        if len(seg) == 4:
            spec.draw_line(*seg)
            oracle.draw_line(*seg)
        else:
            spec.draw_quad(*seg)
            oracle.draw_quad(*seg)


def _compare_exports(spec, oracle, pad=2):
    sb = spec.bounds()
    ob = oracle.bounds()
    assert sb == ob
    if sb is None:
        return None
    x_min, x_max, y_min, y_max = sb
    x0, y0 = x_min - pad, y_min - pad
    w = x_max - x_min + 1 + 2 * pad
    h = y_max - y_min + 1 + 2 * pad
    got_spec = np.array(spec.export(x0, y0, w, h))
    got_oracle = oracle.export_patch(x0, y0, w, h)
    np.testing.assert_allclose(got_spec, got_oracle, rtol=0, atol=1e-12)
    return got_spec


def _random_contour(rng, n_pts, span=24.0, quads=True):
    """Closed contour of random line/quad segments inside [0, span)^2."""
    pts = [(rng.uniform(0, span), rng.uniform(0, span)) for _ in range(n_pts)]
    segments = []
    for i in range(n_pts):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n_pts]
        if quads and rng.random() < 0.5:
            cx = (x0 + x1) / 2 + rng.uniform(-span / 3, span / 3)
            cy = (y0 + y1) / 2 + rng.uniform(-span / 3, span / 3)
            segments.append((x0, y0, cx, cy, x1, y1))
        else:
            segments.append((x0, y0, x1, y1))
    return segments


def test_fuzz_random_outlines():
    rng = random.Random(0xF0A7)
    for trial in range(60):
        spec, oracle = _both()
        for _ in range(rng.randint(1, 3)):
            _draw_segments(
                spec, oracle, _random_contour(rng, rng.randint(3, 9))
            )
        _compare_exports(spec, oracle)


def test_fuzz_degenerate_edges():
    """Horizontal edges (skipped), zero-length edges, vertical edges,
    sub-pixel shapes, and coordinates straddling pixel corners."""
    rng = random.Random(0xDE6)
    cases = [
        [(3.0, 5.0, 9.0, 5.0)],                    # purely horizontal: no-op
        [(4.0, 2.0, 4.0, 9.0), (4.0, 9.0, 4.0, 2.0)],  # vertical there-and-back
        [(2.0, 2.0, 2.0, 2.0)],                    # zero-length
        [(1.25, 1.25, 1.75, 1.3, 1.5, 1.8), (1.5, 1.8, 1.25, 1.25)],  # sub-pixel
        [(2.0, 2.0, 6.0, 2.0, 6.0, 6.0), (6.0, 6.0, 2.0, 6.0, 2.0, 2.0)],
    ]
    for segments in cases:
        spec, oracle = _both()
        _draw_segments(spec, oracle, segments)
        _compare_exports(spec, oracle)
    # integer-corner triangles
    for _ in range(20):
        spec, oracle = _both()
        pts = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(3)]
        segs = [
            (*map(float, pts[i]), *map(float, pts[(i + 1) % 3]))
            for i in range(3)
        ]
        _draw_segments(spec, oracle, segs)
        _compare_exports(spec, oracle)


def test_real_font_glyphs():
    """Rasterize real NotoSans outlines (lines + quads via the same
    transform as text_placer._rasterize) through both implementations."""
    font = FontEngine(FONT_PATH)
    scale = font.scale_for_pixel_height(14.0)
    for ch in "AgQ8&@":
        gid = font.find_glyph_index(ord(ch))
        shape = font.glyph_shape(gid)
        assert shape is not None
        spec, oracle = _both()
        fx = fy = 0.0
        for v in shape:
            tox, toy = v.x * scale, -v.y * scale
            if v.kind == LINE_TO:
                spec.draw_line(tox, toy, fx, fy)
                oracle.draw_line(tox, toy, fx, fy)
            elif v.kind == CURVE_TO:
                mx, my = v.cx * scale, -v.cy * scale
                spec.draw_quad(tox, toy, mx, my, fx, fy)
                oracle.draw_quad(tox, toy, mx, my, fx, fy)
            fx, fy = tox, toy
        patch = _compare_exports(spec, oracle)
        assert patch is not None and patch.max() > 0.5


def _supersample_coverage(pts, x0, y0, w, h, n=64):
    """Geometry-only coverage oracle: even-odd point-in-polygon over an
    n x n subsample grid per pixel.  Depends on neither implementation."""
    px = np.asarray([p[0] for p in pts])
    py = np.asarray([p[1] for p in pts])
    xs = x0 + (np.arange(w * n) + 0.5) / n
    ys = y0 + (np.arange(h * n) + 0.5) / n
    X, Y = np.meshgrid(xs, ys)
    inside = np.zeros(X.shape, dtype=bool)
    m = len(pts)
    for i in range(m):
        xa, ya = px[i], py[i]
        xb, yb = px[(i + 1) % m], py[(i + 1) % m]
        if ya == yb:
            continue
        cond = (Y >= min(ya, yb)) & (Y < max(ya, yb))
        xcross = xa + (Y - ya) * (xb - xa) / (yb - ya)
        inside ^= cond & (X < xcross)
    return inside.reshape(h, n, w, n).mean(axis=(1, 3))


def test_supersample_independent_check():
    """For a simple polygon, exactly one winding orientation emits, and
    its emission matches brute-force subsampled coverage — a check
    independent of both the spec and the oracle."""
    rng = random.Random(0x5A17)
    for trial in range(8):
        # star-convex polygon (simple by construction)
        cx, cy = 10.0, 10.0
        n = rng.randint(3, 8)
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
        pts = [
            (cx + rng.uniform(2.5, 8.0) * math.cos(a),
             cy + rng.uniform(2.5, 8.0) * math.sin(a))
            for a in angles
        ]
        exports = []
        for orient in (pts, pts[::-1]):
            spec = GlyphSpec()
            for i in range(len(orient)):
                x0, y0 = orient[i]
                x1, y1 = orient[(i + 1) % len(orient)]
                spec.draw_line(x0, y0, x1, y1)
            exports.append(np.array(spec.export(0, 0, 20, 20)))
        nz = [e.max() > 0 for e in exports]
        assert nz.count(True) == 1, "exactly one winding emits"
        emitted = exports[0] if nz[0] else exports[1]
        want = _supersample_coverage(pts, 0, 0, 20, 20)
        np.testing.assert_allclose(emitted, want, rtol=0, atol=0.03)
