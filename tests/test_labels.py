"""Label subsystem: text/icon placement, collision, CPU-vs-device parity."""

import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw.drawer import CpuDrawer, DeviceDrawer
from osm_renderer_tpu.draw.labels.labeler import Labeler
from osm_renderer_tpu.draw.labels.text_placer import TextPlacer
from osm_renderer_tpu.draw.oracle import OracleTile
from osm_renderer_tpu.geodata.importer import import_osm
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler

from tests.conftest import REPO_ROOT

STYLESHEET_DIR = os.path.join(REPO_ROOT, "assets", "stylesheets")


@pytest.fixture(scope="module")
def city(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("city")
    osm = os.path.join(REPO_ROOT, "assets", "fixtures", "minicity.osm")
    if not os.path.exists(osm):
        import subprocess, sys

        os.makedirs(os.path.dirname(osm), exist_ok=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "tools", "make_fixture.py"), osm,
             "--blocks", "24"],
            check=True,
        )
    bin_path = str(tmp / "minicity.bin")
    import_osm(osm, bin_path)
    return GeodataReader.load(bin_path)


@pytest.fixture(scope="module")
def styler():
    return Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")


def _center_tile(reader, zoom):
    tx = reader.tiles["x"] >> (18 - zoom)
    ty = reader.tiles["y"] >> (18 - zoom)
    u = sorted(set(zip(tx.tolist(), ty.tolist())))
    return Tile(zoom, *u[len(u) // 2])


def test_text_renders_and_is_deterministic(city, styler):
    tile = _center_tile(city, 17)
    entities = city.get_entities_in_tile_with_neighbors(tile)
    labeler = Labeler()
    cpu = CpuDrawer(labeler=labeler)
    img1 = cpu.draw_to_pixels(entities, tile, 1, styler)
    img2 = cpu.draw_to_pixels(entities, tile, 1, styler)
    assert np.array_equal(img1, img2)

    # Labels must actually draw something: compare against a no-label render.
    plain = CpuDrawer().draw_to_pixels(entities, tile, 1, styler)
    assert (img1 != plain).any()


def test_device_label_compositing_matches_cpu(tmp_path, styler):
    # Use the small fixture: the exact-precision jnp path is slow on the
    # CPU test backend, so keep the scene tiny.
    from tests.fixtures import build_mini_reader
    from osm_renderer_tpu.core.tile import coords_to_max_zoom_tile

    reader = build_mini_reader(tmp_path)
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tile = Tile(16, t18.x >> 2, t18.y >> 2)
    entities = reader.get_entities_in_tile_with_neighbors(tile)
    cpu = CpuDrawer(labeler=Labeler())
    # Exact per-glyph path: tight tolerance.
    dev = DeviceDrawer(labeler=Labeler(use_atlas=False))
    want = cpu.draw_to_pixels(entities, tile, 1, styler)
    got = dev.render_tiles([(entities, tile)], 1, styler)[0]
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.001
    # Glyph-atlas serving path: positions quantized to 1/(2*PHASE_Q) px
    # (draw/labels/atlas.py), so only AA boundary pixels may deviate, by
    # a bounded amount; interiors are identical.
    dev_atlas = DeviceDrawer(labeler=Labeler(use_atlas=True))
    got_a = dev_atlas.render_tiles([(entities, tile)], 1, styler)[0]
    diff_a = np.abs(want.astype(int) - got_a.astype(int))
    assert (diff_a > 8).mean() < 0.001
    assert diff_a.max() <= 96  # AA edge pixels only


def test_collision_all_or_nothing(city, styler):
    # Drawing the same label set twice: second pass must be fully rejected,
    # output unchanged (earlier labels win).
    tile = _center_tile(city, 17)
    entities = city.get_entities_in_tile_with_neighbors(tile)
    labeler = Labeler()
    scratch = OracleTile(1)
    scratch.reset(None)
    labeler.draw_labels(scratch, entities, tile, 1.0, styler)
    once = scratch.export_label_layer()
    labeler.draw_labels(scratch, entities, tile, 1.0, styler)
    twice = scratch.export_label_layer()
    assert np.array_equal(once, twice)
    assert once[..., 3].max() > 0


def test_glyph_shapes_nonempty():
    placer = TextPlacer()
    for ch in "AgQ–ЖΩё":
        gid = placer.font.find_glyph_index(ord(ch))
        assert gid != 0, ch
        shape = placer.font.glyph_shape(gid)
        assert shape is not None and len(shape) > 3, ch
    assert placer.font.find_glyph_index(0x4E2D) in (0,)  # CJK not in NotoSans basic


def test_icon_cache():
    symbols = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "mapcss", "symbols"
    )
    from osm_renderer_tpu.draw.labels.icons import IconCache

    names = [n for n in sorted(os.listdir(symbols)) if n.endswith(".png") or n.endswith(".svg")]
    cache = IconCache(symbols)
    loaded = 0
    for n in names[:20]:
        icon = cache.get(n)
        if icon is not None:
            assert icon.rgba.shape[2] == 4
            assert 0.0 <= icon.rgba.min() and icon.rgba.max() <= 1.0
            loaded += 1
    assert loaded > 0
    assert cache.get("missing.png") is None


def test_icon_label_blit(city, styler):
    symbols = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "mapcss", "symbols"
    )
    from osm_renderer_tpu.draw.labels.icons import IconCache

    cache = IconCache(symbols)
    names = [n for n in sorted(os.listdir(symbols)) if n.endswith(".png")]
    icon = next(c for c in (cache.get(n) for n in names) if c is not None)

    scratch = OracleTile(1)
    scratch.reset(None)
    ok = scratch.label_icon(100, 100, icon.rgba)
    assert ok
    scratch.bump_label_generation(True)
    # Overlapping second icon must be rejected.
    assert not scratch.label_icon(100 + icon.width // 2, 100, icon.rgba)


def test_fill_image(city):
    """Tiled icon fills (fill.rs:36-40): icon sampled at (x % w, y % h)."""
    symbols = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "mapcss", "symbols"
    )
    import numpy as np

    from osm_renderer_tpu.draw.labels.icons import IconCache

    cache = IconCache(symbols)
    names = [n for n in sorted(os.listdir(symbols)) if n.endswith(".png")]
    name = next(n for n in names if cache.get(n) is not None)
    icon = cache.get(name)

    tile = OracleTile(1)
    tile.reset((255, 255, 255))
    edges = np.array(
        [[20, 20, 200, 20], [200, 20, 200, 180], [200, 180, 20, 180], [20, 180, 20, 20]],
        dtype=np.int32,
    )
    tile.fill_contour_icon(edges, icon.rgba)
    tile.bump_generation()
    tile.blend_unfinished(False)
    tile.blend_unfinished(True)
    img = tile.to_rgb()

    # Interior pixel (x, y) must equal icon pixel (x % w, y % h) blended
    # over white.
    for (x, y) in [(64, 64), (100, 137), (190, 90)]:
        px = icon.rgba[y % icon.height, x % icon.width]
        a = px[3]
        want = np.trunc(
            np.clip((px[:3] * 255.0 + (1 - a) * 255.0), 0, 255)
        ).astype(np.uint8)
        got = img[y, x]
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, (x, y, got, want)


import os as _os

_SYMBOLS = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "fixtures", "mapcss", "symbols"
)


def test_icon_cache_decodes_real_symbol_pngs():
    """Decode a spread of the reference's shipped symbol PNGs (various
    color types) to premultiplied f64 RGBA."""
    import numpy as np

    from osm_renderer_tpu.draw.labels.icons import IconCache

    cache = IconCache(_SYMBOLS)
    names = sorted(n for n in _os.listdir(_SYMBOLS) if n.endswith(".png"))
    assert len(names) > 200
    ok = 0
    for name in names[::13]:
        icon = cache.get(name)
        if icon is None:
            continue
        assert icon.rgba.ndim == 3 and icon.rgba.shape[2] == 4
        a = icon.rgba[..., 3]
        assert (a >= 0).all() and (a <= 1).all()
        # premultiplied: color channels never exceed alpha
        assert (icon.rgba[..., :3] <= a[..., None] + 1e-12).all()
        ok += 1
    assert ok >= 15


def test_atlas_label_layer_matches_exact(city, styler):
    """Glyph-atlas compositor vs the exact scanline path over real
    tiles: same committed labels (collision decisions identical), AA
    boundary pixels within the quantization bound, interiors exact."""
    from osm_renderer_tpu.core.tile import Tile as _Tile

    tiles = [_center_tile(city, z) for z in (16, 17)]
    exact = Labeler(use_atlas=False)
    fast = Labeler(use_atlas=True)
    base = np.full((256, 256, 3), 240, np.uint8)
    for tile in tiles:
        entities = city.get_entities_in_tile_with_neighbors(tile)
        a = exact.composite_labels(base, entities, tile, 1.0, styler)
        b = fast.composite_labels(base, entities, tile, 1.0, styler)
        d = np.abs(a.astype(int) - b.astype(int))
        # Any big diff means a different collision DECISION, not AA.
        assert (d > 96).sum() == 0, (tile, d.max())
        assert (d > 8).mean() < 2e-3, tile


def test_atlas_collision_all_or_nothing(city, styler):
    """Atlas path: re-labeling the same scene must commit nothing new
    (earlier successful labels win), mirroring the oracle rule."""
    from osm_renderer_tpu.draw.labels.atlas import GlyphAtlas, LabelLayer
    from osm_renderer_tpu.mapcss.styler import TextPosition
    from osm_renderer_tpu.geodata.reader import Way

    tile = _center_tile(city, 17)
    entities = city.get_entities_in_tile_with_neighbors(tile)
    labeler = Labeler(use_atlas=True)
    once = labeler._label_layer_atlas(entities, tile, 1.0, styler, 256).copy()
    assert once[..., 3].max() > 0

    # Same labels staged twice into ONE layer: second round all rejected.
    from osm_renderer_tpu.draw.labels.atlas import LabelLayer as LL

    layer = LL(256)
    atlas = labeler._atlas
    for _round in range(2):
        styled_areas = styler.style_areas(
            entities.ways, entities.multipolygons, tile.zoom, True
        )
        styled_nodes = styler.style_entities(entities.nodes, tile.zoom, True)
        for entity, style in styled_areas:
            default_pos = (
                TextPosition.LINE if isinstance(entity, Way) else TextPosition.CENTER
            )
            labeler._label_entity_atlas(
                entity, style, tile, 1.0, default_pos, layer, atlas
            )
        for entity, style in styled_nodes:
            labeler._label_entity_atlas(
                entity, style, tile, 1.0, TextPosition.CENTER, layer, atlas
            )
        if _round == 0:
            first = layer.export_center().copy()
    assert np.array_equal(first, layer.export_center())


def test_native_label_composite_matches_numpy():
    """The C++ compact-patch src-over (pngenc.cpp osmr_label_composite)
    must be byte-identical to the numpy expression it replaces."""
    from osm_renderer_tpu.draw.png_writer import _get_native

    lib = _get_native()
    if lib is None:
        pytest.skip("native pngenc unavailable")
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    y0, y1, x0, x1 = 40, 173, 7, 201
    h, w = y1 - y0, x1 - x0
    alpha = np.clip(rng.uniform(-0.4, 1.0, (h, w, 1)), 0.0, 1.0)
    rgb255 = rng.uniform(0.0, 1.0, (h, w, 3)) * alpha * 255.0

    sub = rgb255 + (1.0 - alpha) * base[y0:y1, x0:x1].astype(np.float64)
    want = base.copy()
    want[y0:y1, x0:x1] = np.clip(np.trunc(sub + 1e-9), 0, 255).astype(np.uint8)

    got = base.copy()
    lib.osmr_label_composite(
        got, got.shape[1], y0, y1, x0, x1,
        np.ascontiguousarray(rgb255), np.ascontiguousarray(alpha[..., 0]),
    )
    np.testing.assert_array_equal(got, want)
