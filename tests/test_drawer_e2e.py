"""End-to-end: geodata -> styler -> CPU oracle drawer vs device drawer."""

import numpy as np

from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
from osm_renderer_tpu.draw.drawer import CpuDrawer, DeviceDrawer
from osm_renderer_tpu.mapcss.parser import parse_string
from osm_renderer_tpu.mapcss.styler import Styler

from tests.fixtures import build_mini_reader

STYLE = """
canvas { fill-color: #f1eee8; }
way[building] { fill-color: #d9d0c9; color: #b5aba3; width: 0.5; z-index: 5; }
way[highway=residential] {
    color: #ffffff; width: 5; casing-color: #bbbbbb; casing-width: 1;
    z-index: 10; linecap: round;
}
area[natural=water], way[natural=water] { fill-color: #b5d0d0; z-index: 2; }
way|z17-[highway] { dashes: 6,3; }
"""


def _tiles_around_fixture(zoom):
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    shift = 18 - zoom
    cx, cy = t18.x >> shift, t18.y >> shift
    return [Tile(zoom, cx + dx, cy + dy) for dx in (-1, 0) for dy in (-1, 0)]


def test_device_matches_cpu_drawer(tmp_path):
    reader = build_mini_reader(tmp_path)
    styler = Styler(parse_string(STYLE), "josm")
    cpu = CpuDrawer()
    dev = DeviceDrawer()

    for zoom in (15, 16, 17, 18):
        tiles = _tiles_around_fixture(zoom)
        tiles_entities = [
            (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
        ]
        got = dev.render_tiles(tiles_entities, 1, styler)
        for i, (entities, t) in enumerate(tiles_entities):
            want = cpu.draw_to_pixels(entities, t, 1, styler)
            diff = np.abs(want.astype(int) - got[i].astype(int))
            assert diff.max() <= 1, (
                f"zoom {zoom} tile {t}: max diff {diff.max()} at "
                f"{np.unravel_index(np.argmax(diff.max(axis=-1)), diff.shape[:2])}"
            )
            # Large diffs are disallowed entirely; tiny (1/255) rounding
            # differences must stay rare.
            assert (diff > 0).mean() < 0.01


def test_2x_scale(tmp_path):
    reader = build_mini_reader(tmp_path)
    styler = Styler(parse_string(STYLE), "josm")
    cpu = CpuDrawer()
    dev = DeviceDrawer()
    t = _tiles_around_fixture(17)[1]
    entities = reader.get_entities_in_tile_with_neighbors(t)
    got = dev.render_tiles([(entities, t)], 2, styler)
    want = cpu.draw_to_pixels(entities, t, 2, styler)
    assert got.shape == (1, 512, 512, 3)
    diff = np.abs(want.astype(int) - got[0].astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_fill_image_from_stylesheet(tmp_path):
    """fill-image styled from MapCSS renders identically through the CPU
    oracle (fill_contour_icon) and the device pattern path."""
    import os

    from PIL import Image

    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = build_mini_reader(tmp_path)
    icon_dir = tmp_path / "styledir"
    os.makedirs(icon_dir / "icons", exist_ok=True)
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 7, 4), dtype=np.uint8)
    px[..., 3] = rng.integers(100, 256, size=(9, 7), dtype=np.uint8)
    Image.fromarray(px, "RGBA").save(icon_dir / "icons" / "pat.png")

    # fill-color wins over fill-image (drawer.rs:156-219 precedence), so
    # the icon-filled entities must carry no fill-color.
    style = """
canvas { fill-color: #f1eee8; }
way[building] { fill-image: "icons/pat.png"; z-index: 5; }
way[highway=residential] { color: #ffffff; width: 5; z-index: 10; }
area[natural=water], way[natural=water] { fill-color: #b5d0d0; z-index: 2; }
"""
    styler = Styler(parse_string(style), "josm")
    cpu = CpuDrawer(stylesheet_dir=str(icon_dir))
    dev = BatchRenderer(
        styler, backend="pallas", interpret=True, stylesheet_dir=str(icon_dir)
    )

    # All 4 tiles around the fixture: some contain no in-window fill
    # coverage (their span chunks are dropped entirely), one carries the
    # icon-filled building.
    tiles = _tiles_around_fixture(16)
    tiles_entities = [
        (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
    ]
    prepared = dev.prepare(tiles_entities, 1)
    assert not prepared.cpu_fallback_tiles
    from osm_renderer_tpu.ops.render_pallas import KIND_FILL_IMAGE

    assert KIND_FILL_IMAGE in np.asarray(prepared.batch.kind)
    got = np.asarray(dev.render_prepared(prepared))
    for i, (entities, t) in enumerate(tiles_entities):
        want = cpu.draw_to_pixels(entities, t, 1, styler)
        diff = np.abs(want.astype(int) - got[i].astype(int))
        assert diff.max() <= 1, (t, diff.max())


def test_fill_image_jnp_backend(tmp_path):
    """fill-image on the pure-XLA (jnp) backend matches the CPU oracle."""
    import os

    from PIL import Image

    reader = build_mini_reader(tmp_path)
    icon_dir = tmp_path / "styledir"
    os.makedirs(icon_dir / "icons", exist_ok=True)
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(6, 11, 4), dtype=np.uint8)
    px[..., 3] = rng.integers(90, 256, size=(6, 11), dtype=np.uint8)
    Image.fromarray(px, "RGBA").save(icon_dir / "icons" / "pat.png")

    style = """
canvas { fill-color: #f1eee8; }
way[building] { fill-image: "icons/pat.png"; z-index: 5; }
way[highway=residential] { color: #ffffff; width: 5; z-index: 10; }
area[natural=water], way[natural=water] { fill-color: #b5d0d0; z-index: 2; }
"""
    styler = Styler(parse_string(style), "josm")
    cpu = CpuDrawer(stylesheet_dir=str(icon_dir))
    dev = DeviceDrawer(stylesheet_dir=str(icon_dir))

    tiles = _tiles_around_fixture(16)[:2]
    tiles_entities = [
        (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
    ]
    got = dev.render_tiles(tiles_entities, 1, styler)
    for i, (entities, t) in enumerate(tiles_entities):
        want = cpu.draw_to_pixels(entities, t, 1, styler)
        diff = np.abs(want.astype(int) - got[i].astype(int))
        assert diff.max() <= 1, (t, diff.max())
