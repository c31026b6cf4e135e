"""Pallas TPU kernel: interpret-mode parity against the C++ oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from osm_renderer_tpu.draw import primitives as P
from osm_renderer_tpu.ops import render_pallas as RP
from osm_renderer_tpu.ops.coverage_np import (
    LINE_CAP_BUTT,
    LINE_CAP_ROUND,
    LINE_CAP_SQUARE,
)

from tests.test_coverage_parity import (
    CANVAS,
    make_polygon,
    make_polyline,
    oracle_render,
    rand_color,
)


def pallas_render(prims_dev, ts=256):
    profiles = P.ProfileTable()
    stream = P.stream_tile(prims_dev, profiles, RP.CH)
    pb = RP.build_pallas_batch([stream], profiles, ts)
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    return np.asarray(RP.render_batch_pallas(pb, canvas, ts, 1, True))[0]


def test_pallas_interpret_mixed_scene():
    rng = np.random.default_rng(5)
    prims_oracle, prims_dev = [], []
    for _ in range(4):
        edges = make_polygon(rng)
        c = rand_color(rng)
        prims_oracle.append({"kind": "fill", "edges": edges, "color": c, "opacity": 0.9})
        prims_dev.append(P.FillPrim(kind="fill", color=c, opacity=0.9, edges=edges))
    for _ in range(4):
        pairs = make_polyline(rng)
        c = rand_color(rng)
        cap = int(rng.choice([LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE]))
        dashes = [6.0, 3.0] if rng.integers(0, 2) else None
        w = float(rng.choice([1.0, 3.0, 6.5]))
        prims_oracle.append(
            {"kind": "stroke", "pairs": pairs, "color": c, "opacity": 1.0,
             "width": w, "dashes": dashes, "cap": cap, "use_caps_for_dashes": True}
        )
        prims_dev.append(P.make_stroke_prim(pairs, w, c, 1.0, dashes, cap, True))

    want = oracle_render(prims_oracle)
    got = pallas_render(prims_dev)
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_pallas_interpret_row_block_boundaries():
    # Geometry aligned to RB boundaries to exercise the block loops.
    prims_oracle, prims_dev = [], []
    edges = np.array(
        [[10, 31, 250, 31], [250, 31, 250, 97], [250, 97, 10, 97], [10, 97, 10, 31]],
        dtype=np.int64,
    )
    prims_oracle.append({"kind": "fill", "edges": edges, "color": (40, 90, 160), "opacity": 1.0})
    prims_dev.append(P.FillPrim(kind="fill", color=(40, 90, 160), opacity=1.0, edges=edges))
    pairs = np.array([[0, 64, 255, 64], [255, 64, 255, 255]], dtype=np.int64)
    prims_oracle.append(
        {"kind": "stroke", "pairs": pairs, "color": (200, 30, 30), "opacity": 0.8,
         "width": 7.0, "dashes": None, "cap": LINE_CAP_ROUND, "use_caps_for_dashes": True}
    )
    prims_dev.append(
        P.make_stroke_prim(pairs, 7.0, (200, 30, 30), 0.8, None, LINE_CAP_ROUND, True)
    )

    want = oracle_render(prims_oracle)
    got = pallas_render(prims_dev)
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1


def test_packed_stream_matches_oracle():
    """Primitive packing (shared chunks) must not change the output."""
    rng = np.random.default_rng(21)
    prims_oracle, prims_dev = [], []
    # Many small same-style "buildings" + same-style road strokes.
    for _ in range(30):
        edges = make_polygon(rng)
        prims_oracle.append({"kind": "fill", "edges": edges, "color": (217, 208, 201), "opacity": 1.0})
        prims_dev.append(P.FillPrim(kind="fill", color=(217, 208, 201), opacity=1.0, edges=edges))
    for _ in range(12):
        pairs = make_polyline(rng)
        prims_oracle.append(
            {"kind": "stroke", "pairs": pairs, "color": (255, 255, 255), "opacity": 1.0,
             "width": 3.0, "dashes": None, "cap": LINE_CAP_BUTT, "use_caps_for_dashes": True}
        )
        prims_dev.append(
            P.make_stroke_prim(pairs, 3.0, (255, 255, 255), 1.0, None, LINE_CAP_BUTT, True)
        )

    want = oracle_render(prims_oracle)

    profiles = P.ProfileTable()
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH)
    n_packed = len(stream.chunk_kind)
    assert n_packed < len(prims_dev) / 2, f"packing ineffective: {n_packed} chunks"
    pb = RP.build_pallas_batch([stream], profiles, 256)
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1


def test_pallas_2x_canvas():
    """ts=512 (@2x) exercises 4 column halves and larger scratch."""
    rng = np.random.default_rng(17)
    prims_oracle, prims_dev = [], []
    for _ in range(3):
        edges = (make_polygon(rng) * 2).astype(np.int64)
        c = rand_color(rng)
        prims_oracle.append({"kind": "fill", "edges": edges, "color": c, "opacity": 1.0})
        prims_dev.append(P.FillPrim(kind="fill", color=c, opacity=1.0, edges=edges))
    for _ in range(3):
        pairs = (make_polyline(rng) * 2).astype(np.int64)
        c = rand_color(rng)
        prims_oracle.append(
            {"kind": "stroke", "pairs": pairs, "color": c, "opacity": 1.0,
             "width": 6.0, "dashes": [12.0, 6.0], "cap": LINE_CAP_ROUND,
             "use_caps_for_dashes": True}
        )
        prims_dev.append(
            P.make_stroke_prim(pairs, 6.0, c, 1.0, [12.0, 6.0], LINE_CAP_ROUND, True)
        )

    want = oracle_render(prims_oracle, ts_scale=2)
    profiles = P.ProfileTable()
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, size=512)
    pb = RP.build_pallas_batch([stream], profiles, 512)
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 512, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert got.shape == (512, 512, 3)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_dashed_round_cap_chain_rule():
    """Round caps on dashes make in_line non-monotone along the walk's
    perpendiculars; the kernel must reproduce the first-dead-pixel
    cutoff (walk-chain rule).  These segments previously differed from
    the oracle by up to 100/255."""
    cases = [
        ((222, 404), (538, 68)),     # the original 2x repro
        ((339, 263), (99, 536)),
        ((370, 110), (74, 507)),
        ((170, 529), (413, 49)),
        ((170, 84), (131, 146)),
    ]
    for p1, p2 in cases:
        pairs = np.array([[p1[0], p1[1], p2[0], p2[1]]], dtype=np.int64)
        prims_oracle = [
            {"kind": "stroke", "pairs": pairs, "color": (200, 10, 10),
             "opacity": 1.0, "width": 6.0, "dashes": [12.0, 6.0],
             "cap": LINE_CAP_ROUND, "use_caps_for_dashes": True}
        ]
        prims_dev = [
            P.make_stroke_prim(pairs, 6.0, (200, 10, 10), 1.0, [12.0, 6.0],
                               LINE_CAP_ROUND, True)
        ]
        want = oracle_render(prims_oracle, ts_scale=2)
        profiles = P.ProfileTable()
        stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, size=512)
        pb = RP.build_pallas_batch([stream], profiles, 512)
        pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
        canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
        got = np.asarray(RP.render_batch_pallas(pb, canvas, 512, 1, True))[0]
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 1, (p1, p2, diff.max())


def test_icon_fill_matches_oracle(tmp_path):
    """Device-side tiled fill-image (KIND_FILL_IMAGE) vs the oracle's
    fill_contour_icon: same mask, per-pixel premultiplied icon source,
    fill opacity ignored (fill.rs:36-40)."""
    from PIL import Image

    from osm_renderer_tpu.draw.labels.icons import IconCache
    from osm_renderer_tpu.draw.oracle import OracleTile

    rng = np.random.default_rng(7)
    icon_px = rng.integers(0, 256, size=(10, 12, 4), dtype=np.uint8)
    icon_px[..., 3] = rng.integers(60, 256, size=(10, 12), dtype=np.uint8)
    Image.fromarray(icon_px, "RGBA").save(tmp_path / "pat.png")
    cache = IconCache(str(tmp_path))
    icon = cache.get("pat.png")
    assert icon is not None

    polys = [make_polygon(rng) for _ in range(3)]
    stroke_pairs = make_polyline(rng)

    # Oracle: plain fill, icon fill, stroke, icon fill (order matters).
    tile = OracleTile(1)
    tile.reset(CANVAS)
    tile.fill_contour(polys[0], (60, 120, 60), 0.8)
    tile.bump_generation()
    tile.fill_contour_icon(polys[1], icon.rgba)
    tile.bump_generation()
    tile.draw_lines(stroke_pairs, 3.0, (255, 255, 255), 1.0, None, LINE_CAP_BUTT, True)
    tile.bump_generation()
    tile.fill_contour_icon(polys[2], icon.rgba)
    tile.bump_generation()
    tile.blend_unfinished(False)
    tile.blend_unfinished(True)
    want = tile.to_rgb()

    prims_dev = [
        P.FillPrim(kind="fill", color=(60, 120, 60), opacity=0.8, edges=polys[0]),
        P.FillPrim(kind="fill", color=None, opacity=1.0, edges=polys[1],
                   fill_image="pat.png"),
        P.make_stroke_prim(stroke_pairs, 3.0, (255, 255, 255), 1.0, None,
                           LINE_CAP_BUTT, True),
        P.FillPrim(kind="fill", color=None, opacity=1.0, edges=polys[2],
                   fill_image="pat.png"),
    ]
    profiles = P.ProfileTable()
    patterns = P.PatternTable(cache, 256)
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, patterns)
    assert not stream.has_icon_fills
    assert RP.KIND_FILL_IMAGE in stream.chunk_kind
    pb = RP.build_pallas_batch([stream], profiles, 256, patterns)
    assert pb.patterns.shape[0] == 1  # deduplicated
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    # Random per-pixel icon alpha makes 1-ulp f32 rounding denser than
    # for constant-color fills.
    assert (diff > 0).mean() < 5e-3


def test_oversize_fill_layer_matches_oracle(tmp_path):
    """Fills with more edges than one chunk (> CH) render via scanline
    span chunks split across the stream (spans are independent, unlike
    edges); output must still match the sequential oracle."""
    from PIL import Image

    from osm_renderer_tpu.draw.labels.icons import IconCache
    from osm_renderer_tpu.draw.oracle import OracleTile

    rng = np.random.default_rng(13)

    def big_star(cx, cy, n, r_out, r_in):
        ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        r = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
        px = np.round(cx + r * np.cos(ang)).astype(np.int64)
        py = np.round(cy + r * np.sin(ang)).astype(np.int64)
        pts = np.stack([px, py], 1)
        pts = np.concatenate([pts, pts[:1]], 0)
        return np.concatenate([pts[:-1], pts[1:]], axis=1)

    star_a = big_star(90, 110, 100, 85, 40)    # 200 edges > CH
    star_b = big_star(180, 170, 80, 70, 30)    # 160 edges > CH
    small = make_polygon(rng)
    assert star_a.shape[0] > RP.CH and star_b.shape[0] > RP.CH

    icon_px = rng.integers(0, 256, size=(8, 9, 4), dtype=np.uint8)
    icon_px[..., 3] = rng.integers(120, 256, size=(8, 9), dtype=np.uint8)
    Image.fromarray(icon_px, "RGBA").save(tmp_path / "big.png")
    cache = IconCache(str(tmp_path))
    icon = cache.get("big.png")

    tile = OracleTile(1)
    tile.reset(CANVAS)
    tile.fill_contour(star_a, (50, 90, 180), 0.75)
    tile.bump_generation()
    tile.fill_contour(small, (200, 60, 60), 1.0)
    tile.bump_generation()
    tile.fill_contour_icon(star_b, icon.rgba)
    tile.bump_generation()
    tile.blend_unfinished(False)
    tile.blend_unfinished(True)
    want = tile.to_rgb()

    prims_dev = [
        P.FillPrim(kind="fill", color=(50, 90, 180), opacity=0.75, edges=star_a),
        P.FillPrim(kind="fill", color=(200, 60, 60), opacity=1.0, edges=small),
        P.FillPrim(kind="fill", color=None, opacity=1.0, edges=star_b,
                   fill_image="big.png"),
    ]
    profiles = P.ProfileTable()
    patterns = P.PatternTable(cache, 256)
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, patterns)
    assert not stream.has_icon_fills
    # Oversize fills stay on the device span path — no host layers.
    assert stream.chunk_kind.count(RP.KIND_LAYER) == 0
    assert RP.KIND_FILL_IMAGE in stream.chunk_kind
    pb = RP.build_pallas_batch([stream], profiles, 256, patterns)
    # The big stars' spans overflow one chunk and split.
    assert np.asarray(pb.kind).tolist().count(RP.KIND_FILL) >= 2
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 5e-3


def test_out_of_bound_coords_via_layers():
    """Prims whose tile-relative coordinates exceed the int32-safe bound
    render through exact f64 host layers instead of failing the batch."""
    from osm_renderer_tpu.draw.oracle import OracleTile
    from osm_renderer_tpu.draw.primitives import FAST_COORD_BOUND

    far = 5 * FAST_COORD_BOUND
    tri = np.array(
        [[-far, -100, 200, 90], [200, 90, 120, far], [120, far, -far, -100]],
        dtype=np.int64,
    )
    pairs = np.array([[-far, 60, far, 180]], dtype=np.int64)
    small = make_polygon(np.random.default_rng(3))

    tile = OracleTile(1)
    tile.reset(CANVAS)
    tile.fill_contour(tri, (70, 130, 70), 0.9)
    tile.bump_generation()
    tile.draw_lines(pairs, 5.0, (250, 250, 240), 1.0, [8.0, 4.0], LINE_CAP_ROUND, True)
    tile.bump_generation()
    tile.fill_contour(small, (180, 40, 40), 1.0)
    tile.bump_generation()
    tile.blend_unfinished(False)
    tile.blend_unfinished(True)
    want = tile.to_rgb()

    prims_dev = [
        P.FillPrim(kind="fill", color=(70, 130, 70), opacity=0.9, edges=tri),
        P.make_stroke_prim(pairs, 5.0, (250, 250, 240), 1.0, [8.0, 4.0],
                           LINE_CAP_ROUND, True),
        P.FillPrim(kind="fill", color=(180, 40, 40), opacity=1.0, edges=small),
    ]
    profiles = P.ProfileTable()
    patterns = P.PatternTable(None, 256)
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, patterns)
    assert stream.chunk_kind.count(RP.KIND_LAYER) == 2
    assert not stream.has_icon_fills
    pb = RP.build_pallas_batch([stream], profiles, 256, patterns)
    assert int(np.abs(np.asarray(pb.geom)).max()) < FAST_COORD_BOUND
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 5e-3


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_pallas_fuzz_scenes(seed):
    """Randomized scenes through the packed pallas pipeline vs oracle."""
    rng = np.random.default_rng(seed)
    dash_choices = [None, [6.0, 3.0], [2.0, 2.0], [10.0, 4.0, 2.0, 4.0]]
    prims_oracle, prims_dev = [], []
    for _ in range(int(rng.integers(3, 8))):
        edges = make_polygon(rng)
        c = rand_color(rng)
        op = float(rng.choice([1.0, 0.7]))
        prims_oracle.append({"kind": "fill", "edges": edges, "color": c, "opacity": op})
        prims_dev.append(P.FillPrim(kind="fill", color=c, opacity=op, edges=edges))
    for _ in range(int(rng.integers(3, 8))):
        pairs = make_polyline(rng)
        c = rand_color(rng)
        cap = int(rng.choice([LINE_CAP_BUTT, LINE_CAP_ROUND, LINE_CAP_SQUARE]))
        dashes = dash_choices[int(rng.integers(0, len(dash_choices)))]
        w = float(rng.choice([0.5, 1.0, 2.4, 3.0, 6.5, 11.0]))
        prims_oracle.append(
            {"kind": "stroke", "pairs": pairs, "color": c, "opacity": 1.0,
             "width": w, "dashes": dashes, "cap": cap, "use_caps_for_dashes": True}
        )
        prims_dev.append(P.make_stroke_prim(pairs, w, c, 1.0, dashes, cap, True))

    want = oracle_render(prims_oracle)
    profiles = P.ProfileTable()
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH)
    pb = RP.build_pallas_batch([stream], profiles, 256)
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_wide_round_capped_dash_routes_to_exact_layer():
    """Round-capped strokes wider than the walk-chain exactness bound
    (CHAIN_EXACT_HALF_WIDTH) must take the exact f64 host-layer path
    and still match the oracle byte-for-byte."""
    from osm_renderer_tpu.draw.primitives import CHAIN_EXACT_HALF_WIDTH

    w = 2.0 * (CHAIN_EXACT_HALF_WIDTH + 3.0)  # hw = 10 > bound
    pairs = np.array([[30, 40, 220, 180]], dtype=np.int64)
    prims_oracle = [
        {"kind": "stroke", "pairs": pairs, "color": (20, 60, 200),
         "opacity": 1.0, "width": w, "dashes": [18.0, 9.0],
         "cap": LINE_CAP_ROUND, "use_caps_for_dashes": True}
    ]
    prims_dev = [
        P.make_stroke_prim(pairs, w, (20, 60, 200), 1.0, [18.0, 9.0],
                           LINE_CAP_ROUND, True)
    ]
    want = oracle_render(prims_oracle)
    profiles = P.ProfileTable()
    patterns = P.PatternTable(None, 256)
    stream = P.stream_tile_packed(prims_dev, profiles, RP.CH, patterns)
    assert RP.KIND_LAYER in stream.chunk_kind  # routed off the kernel
    pb = RP.build_pallas_batch([stream], profiles, 256, patterns)
    pb = RP.PallasBatch(*(jnp.asarray(x) for x in pb))
    canvas = jnp.array([c / 255.0 for c in CANVAS], dtype=jnp.float32)
    got = np.asarray(RP.render_batch_pallas(pb, canvas, 256, 1, True))[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
