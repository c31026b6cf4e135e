"""Scanline span extraction (draw/spans.py): the closed form must match
the sequential-walk transcription of the reference fill
(fill.rs:16-104 / native/oracle.cpp FillContour) exactly."""

import numpy as np

from osm_renderer_tpu.draw.spans import fill_spans, fill_spans_multi, fill_spans_walk


def _random_edges(rng, ne, lo, hi, close_prob):
    pts = rng.integers(lo, hi, size=(ne + 1, 2))
    if rng.random() < close_prob:
        pts[-1] = pts[0]
    return np.concatenate([pts[:-1], pts[1:]], axis=1)


def test_fill_spans_matches_walk_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(1500):
        ts = int(rng.choice([16, 32, 64]))
        edges = _random_edges(rng, int(rng.integers(1, 12)), -10, ts + 10, 0.7)
        assert np.array_equal(fill_spans(edges, ts), fill_spans_walk(edges, ts))


def test_fill_spans_out_of_window_clipping():
    rng = np.random.default_rng(7)
    for _ in range(200):
        edges = _random_edges(rng, int(rng.integers(2, 8)), -400, 700, 0.8)
        assert np.array_equal(fill_spans(edges, 256), fill_spans_walk(edges, 256))


def test_fill_spans_degenerate_and_horizontal():
    # Single-pixel and horizontal edges are fully poisoned and must
    # contribute nothing (fill.rs poisoned-vertex rule).
    for edges in (
        np.array([[5, 5, 5, 5]]),
        np.array([[2, 9, 30, 9]]),
        np.array([[2, 9, 30, 9], [30, 9, 2, 9]]),
    ):
        assert fill_spans(edges, 64).shape == (0, 3)
        assert fill_spans_walk(edges, 64).shape == (0, 3)


def test_fill_spans_multi_equals_per_prim():
    rng = np.random.default_rng(3)
    prims = [
        _random_edges(rng, int(rng.integers(1, 10)), -10, 70, 0.8)
        for _ in range(40)
    ]
    prims.insert(5, np.zeros((0, 4), dtype=np.int64))  # empty prim
    multi = fill_spans_multi(prims, 64)
    for edges, got in zip(prims, multi):
        assert np.array_equal(got, fill_spans(edges, 64))


def test_fill_spans_simple_rect():
    # 10x10 closed rectangle: rows 3..11 (half-open top per the
    # poisoned-vertex rule resolves to the walk's exact row set).
    edges = np.array(
        [[2, 2, 12, 2], [12, 2, 12, 12], [12, 12, 2, 12], [2, 12, 2, 2]],
        dtype=np.int64,
    )
    spans = fill_spans(edges, 64)
    walk = fill_spans_walk(edges, 64)
    assert np.array_equal(spans, walk)
    assert spans.shape[0] > 0
    assert (spans[:, 1] == 2).all() and (spans[:, 2] == 12).all()


def test_staircase_owner_estimate_within_one():
    """The kernel inverts the walk staircase h(k) = k + g(k) from the
    f32 estimate k ~= T * mx^2/(mx^2+mn^2) with ONE correction step each
    way (render_pallas.py).  Pin |k_est - k_owner| <= 1 over an
    exhaustive small range and a random sweep up to the coordinate
    bound."""
    import numpy as np

    def worst_err(pairs):
        worst = 0
        for mn, mx in pairs:
            k = np.arange(0, mx + 1, dtype=np.int64)
            c = (2 * k * mn + mx - 1) // (2 * mx)
            g = (2 * c * mn + mx - 1) // (2 * mx)
            h = k + g
            T = np.arange(0, int(h[-1]) + 1, dtype=np.int64)
            k_true = np.searchsorted(h, T, side="right") - 1
            ratio = np.float32(mx * mx) / np.float32(mx * mx + mn * mn)
            k_est = np.clip((T.astype(np.float32) * ratio).astype(np.int64), 0, mx)
            worst = max(worst, int(np.abs(k_est - k_true).max()))
        return worst

    exhaustive = [(mn, mx) for mx in range(1, 200) for mn in range(0, mx + 1)]
    assert worst_err(exhaustive) <= 1

    rng = np.random.default_rng(3)
    rand_pairs = []
    for mx in rng.integers(200, 24001, 150):
        for mn in rng.integers(0, int(mx) + 1, 8):
            rand_pairs.append((int(mn), int(mx)))
    assert worst_err(rand_pairs) <= 1
