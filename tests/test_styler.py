"""Style cascade tests (reference semantics from `src/mapcss/styler.rs`)."""

from osm_renderer_tpu.core.color import Color
from osm_renderer_tpu.mapcss.parser import parse_string
from osm_renderer_tpu.mapcss.styler import LineCap, Styler

from tests.fixtures import build_mini_reader

STYLE = """
canvas { fill-color: #f1eee8; background-color: #101010; }

way[building] {
    fill-color: #d9d0c9;
    z-index: 5;
}

way[highway=residential] {
    color: #ffffff;
    width: 3;
    casing-color: #bbbbbb;
    casing-width: 1;
    z-index: 10;
}

way[natural=coast] { color: blue; }

area[natural=water], way[natural=water] { fill-color: #b5d0d0; z-index: 2; }

way[highway]::bridge {
    casing-width: eval(prop("width")+2);
    color: #888888;
}

way|z17-[building] { fill-opacity: 0.8; }
"""


def _styler(style_type="josm"):
    return Styler(parse_string(STYLE), style_type)


def test_canvas_color():
    assert _styler("josm").canvas_fill_color == Color(0xF1, 0xEE, 0xE8)
    assert _styler("mapsme").canvas_fill_color == Color(0x10, 0x10, 0x10)
    assert _styler("josm").use_caps_for_dashes
    assert not _styler("mapsme").use_caps_for_dashes


def test_cascade(tmp_path):
    reader = build_mini_reader(tmp_path)
    from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tile = Tile(16, t18.x >> 2, t18.y >> 2)
    entities = reader.get_entities_in_tile_with_neighbors(tile)

    styler = _styler()
    styled = styler.style_areas(entities.ways, entities.multipolygons, 16, False)

    by_id = {}
    for entity, style in styled:
        by_id.setdefault(entity.global_id, []).append(style)

    building = by_id[100][0]
    assert building.fill_color == Color(0xD9, 0xD0, 0xC9)
    assert building.z_index == 5.0
    assert building.fill_opacity is None  # zoom 16 < 17

    road_styles = by_id[101]
    # Two layers: default + bridge.
    assert len(road_styles) == 2
    road = next(s for s in road_styles if s.casing_color is not None)
    bridge = next(s for s in road_styles if s.casing_color is None)  # ::bridge layer
    assert road.color == Color(255, 255, 255)
    assert road.width == 3.0
    # casing width = base(3) + multiplier(2, JOSM) * casing-width(1) = 5
    assert road.casing_width == 5.0
    # The ::bridge layer does NOT inherit from ::default (only from "*"),
    # so its own width is unset; casing-width eval still sees the base
    # layer width: casing only = base(3) + 2 = 5; full = 3 + 2.0 * 5 = 13.
    assert bridge.width is None
    assert bridge.casing_width == 13.0
    assert bridge.color == Color(0x88, 0x88, 0x88)
    # layer tag parsed from the entity.
    assert road.layer == 1

    water = by_id[200][0]
    assert water.fill_color == Color(0xB5, 0xD0, 0xD0)

    # Paint order: layer tag dominates; road (layer=1) must come last.
    ids_in_order = [e.global_id for e, _ in styled]
    assert ids_in_order[-2:] == [101, 101]
    # Within layer 0: water (z=2) before building (z=5).
    assert ids_in_order.index(200) < ids_in_order.index(100)


def test_mapsme_casing_multiplier(tmp_path):
    reader = build_mini_reader(tmp_path)
    from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tile = Tile(16, t18.x >> 2, t18.y >> 2)
    entities = reader.get_entities_in_tile_with_neighbors(tile)

    styled = _styler("mapsme").style_areas(entities.ways, entities.multipolygons, 16, False)
    road = next(
        s for e, s in styled if e.global_id == 101 and s.casing_color is not None
    )
    # casing width = base(3) + multiplier(1, MapsMe) * casing-width(1) = 4
    assert road.casing_width == 4.0


def test_zoom_gating_and_cache(tmp_path):
    reader = build_mini_reader(tmp_path)
    from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    styler = _styler()

    tile = Tile(18, t18.x, t18.y)
    entities = reader.get_entities_in_tile_with_neighbors(tile)
    styled_z18 = styler.style_areas(entities.ways, entities.multipolygons, 18, False)
    building = next(s for e, s in styled_z18 if e.global_id == 100)
    assert building.fill_opacity == 0.8  # zoom 17+ rule applies

    # Run twice: cache must return identical results.
    styled_again = styler.style_areas(entities.ways, entities.multipolygons, 18, False)
    assert [(e.global_id, id(s)) for e, s in styled_z18] == [
        (e.global_id, id(s)) for e, s in styled_again
    ]
