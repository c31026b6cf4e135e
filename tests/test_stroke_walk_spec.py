"""Fuzz the Rust-transcribed stroke walk (tests/stroke_walk_spec.py)
against this repo's f64 dense stroke model and the C++ oracle.

Closes the two-independent-implementations loop for strokes (VERDICT r2
item 7): fills have it via fill_spans vs fill_spans_walk; here the
executable spec is transcribed directly from the reference Rust
(line.rs, opacity_calculator.rs) while `coverage_np` / `oracle.cpp`
were derived analytically — a shared misreading would show up as a
divergence on these randomized scenes.

Comparisons are exact: f64 alpha equality vs the dense model (which the
existing suite pins byte-exact against the oracle), plus u8 pixel
equality vs the oracle render for a sample of scenes.
"""

import numpy as np
import pytest

from osm_renderer_tpu.ops.coverage_np import (
    LINE_CAP_BUTT,
    LINE_CAP_ROUND,
    LINE_CAP_SQUARE,
    polyline_stroke_alpha,
)

from tests.stroke_walk_spec import draw_lines_walk
from tests.test_coverage_parity import CANVAS, oracle_render

TS = 96


def spec_alpha(pairs, width, opacity, dashes, cap, use_caps, ts):
    """Walk-spec alpha field: generation max of opacity * per-pixel op."""
    alpha = np.zeros((ts, ts), dtype=np.float64)

    def emit(x, y, op):
        if 0 <= x < ts and 0 <= y < ts:
            v = opacity * op
            if v > alpha[y, x]:
                alpha[y, x] = v

    draw_lines_walk(
        [((int(a), int(b)), (int(c), int(d))) for a, b, c, d in pairs],
        width, list(dashes) if dashes is not None else None, cap, use_caps,
        emit,
    )
    return alpha


def random_scene(rng):
    n = int(rng.integers(1, 5))
    pts = rng.integers(4, TS - 4, size=(n + 1, 2))
    pairs = np.concatenate([pts[:-1], pts[1:]], axis=1)
    width = float(rng.choice([0.6, 1.0, 2.5, 4.0, 7.0]))
    dashes = rng.choice([0, 1, 2])
    if dashes == 1:
        dash_list = [6.0, 3.0]
    elif dashes == 2:
        dash_list = [2.0, 2.0, 8.0, 4.0]
    else:
        dash_list = None
    cap = int(rng.choice([LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE]))
    use_caps = bool(rng.integers(0, 2))
    return pairs, width, dash_list, cap, use_caps


@pytest.mark.parametrize("seed", range(40))
def test_spec_matches_dense_model(seed):
    rng = np.random.default_rng(seed)
    pairs, width, dashes, cap, use_caps = random_scene(rng)
    a_spec = spec_alpha(pairs, width, 0.9, dashes, cap, use_caps, TS)
    a_dense = polyline_stroke_alpha(
        pairs, width / 2.0, 0.9, dashes, cap, use_caps, TS
    )
    np.testing.assert_array_equal(
        a_spec, a_dense,
        err_msg=f"scene seed={seed} w={width} dashes={dashes} cap={cap} "
        f"use_caps={use_caps}",
    )


@pytest.mark.parametrize("seed", range(8))
def test_spec_matches_oracle_pixels(seed):
    """End-to-end u8 check: spec alpha blended like TilePixels vs the
    oracle's rendered stroke."""
    rng = np.random.default_rng(100 + seed)
    pairs, width, dashes, cap, use_caps = random_scene(rng)
    color = (210, 40, 90)
    opacity = 1.0

    got = oracle_render(
        [{
            "kind": "stroke", "pairs": pairs, "width": width, "color": color,
            "opacity": opacity, "dashes": dashes, "cap": cap,
            "use_caps_for_dashes": use_caps,
        }],
        ts_scale=1,
    )
    ts = got.shape[0]
    a = spec_alpha(pairs, width, opacity, dashes, cap, use_caps, ts)
    # One generation src-over an opaque canvas, then postdivide with
    # `as u8` truncation (tile_pixels.rs:107-181 semantics).
    want = np.empty((ts, ts, 3), np.uint8)
    for c in range(3):
        chan = 255.0 * (
            a * (color[c] / 255.0) + (1.0 - a) * (CANVAS[c] / 255.0)
        )
        want[:, :, c] = np.clip(chan, 0.0, 255.0).astype(np.uint8)
    np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")
