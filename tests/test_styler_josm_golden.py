"""Styler cascade pinned to JOSM ground truth.

The reference pins its cascade semantics to strings dumped from JOSM's
own MapCSS engine (`tests/test_mapcss_styler.rs:12-97`; dump parser at
`:115-182`).  The original `nano_moscow.osm` fixture is stripped from
the snapshot, but the tested entities are reconstructible from the
expectations: a oneway residential street (6 cascade layers incl. the
four oneway overlays), a pedestrian way (casing + fill), and generic
`building=yes` areas.  The expectation strings below are copied
verbatim from the reference test; the comparison replicates
`assert_styles_eq` / `from_josm_style` field-for-field.
"""

import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
from osm_renderer_tpu.core.color import from_color_name, Color
from osm_renderer_tpu.geodata.importer import import_osm
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import LineCap, Styler

MAPNIK_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "mapcss")

# Reconstructed nano-Moscow scene: tags chosen to exercise exactly the
# mapnik.mapcss rules behind the reference's JOSM dumps (residential +
# oneway, pedestrian, non-residential buildings), around the original
# test tile z18 (158458, 81948).
_LAT, _LON = 55.7558, 37.6173

_OSM_TEMPLATE = """<?xml version='1.0' encoding='UTF-8'?>
<osm version='0.6'>
{nodes}
  <way id='23369934'>
    <nd ref='1' /><nd ref='2' /><nd ref='3' />
    <tag k='highway' v='residential' />
    <tag k='oneway' v='yes' />
    <tag k='name' v='Романов переулок' />
  </way>
  <way id='373569473'>
    <nd ref='2' /><nd ref='4' />
    <tag k='highway' v='pedestrian' />
    <tag k='name' v='Аллея Романов' />
  </way>
  <way id='31497212'>
    <nd ref='5' /><nd ref='6' /><nd ref='7' /><nd ref='8' /><nd ref='5' />
    <tag k='building' v='yes' />
    <tag k='name' v='Бизнес-центр' />
  </way>
  <way id='31482164'>
    <nd ref='9' /><nd ref='10' /><nd ref='11' /><nd ref='12' /><nd ref='9' />
    <tag k='building' v='university' />
    <tag k='name' v='Факультет искусств' />
  </way>
  <way id='44642919'>
    <nd ref='13' /><nd ref='14' /><nd ref='15' /><nd ref='16' /><nd ref='13' />
    <tag k='building' v='public' />
    <tag k='name' v='Факультет журналистики' />
  </way>
</osm>
"""


def _build_fixture(tmp_path):
    d = 0.00003
    coords = [
        (_LAT, _LON), (_LAT + d, _LON + d), (_LAT + 2 * d, _LON + d),
        (_LAT + d, _LON + 3 * d),
        (_LAT - d, _LON), (_LAT - d, _LON + d), (_LAT - 2 * d, _LON + d), (_LAT - 2 * d, _LON),
        (_LAT - d, _LON + 2 * d), (_LAT - d, _LON + 3 * d), (_LAT - 2 * d, _LON + 3 * d), (_LAT - 2 * d, _LON + 2 * d),
        (_LAT + d, _LON - 2 * d), (_LAT + d, _LON - d), (_LAT, _LON - d), (_LAT, _LON - 2 * d),
    ]
    nodes = "\n".join(
        f"  <node id='{i + 1}' lat='{lat:.7f}' lon='{lon:.7f}' />"
        for i, (lat, lon) in enumerate(coords)
    )
    osm = str(tmp_path / "nano_moscow.osm")
    with open(osm, "w", encoding="utf-8") as f:
        f.write(_OSM_TEMPLATE.format(nodes=nodes))
    bin_path = str(tmp_path / "nano_moscow.bin")
    import_osm(osm, bin_path)
    return GeodataReader.load(bin_path)


def _from_josm_style(way_is_closed: bool, style: str) -> dict:
    """Transcription of the reference's JOSM dump parser
    (`test_mapcss_styler.rs:115-182`)."""
    props = {}
    for part in style.removeprefix("Cascade{ ").rstrip("}").split(";"):
        kv = part.strip().split(":", 1)
        if len(kv) > 1:
            props[kv[0]] = kv[1]

    def parse_color(name):
        v = props.get(name)
        if v is None:
            return None
        if v.startswith("#"):
            return Color(int(v[1:3], 16), int(v[3:5], 16), int(v[5:7], 16))
        return from_color_name(v.removeprefix("Keyword{").rstrip("}"))

    def parse_num(name):
        v = props.get(name)
        return float(v) if v is not None else None

    z = parse_num("z-index")
    return {
        "z_index": z if z is not None else (1.0 if way_is_closed else 3.0),
        "color": parse_color("color"),
        "fill_color": parse_color("fill-color"),
        "opacity": parse_num("opacity"),
        "fill_opacity": parse_num("fill-opacity"),
        "width": parse_num("width"),
        "dashes": (
            tuple(
                float(x)
                for x in props["dashes"].lstrip("[").rstrip("]").split(", ")
            )
            if "dashes" in props
            else None
        ),
        "line_cap": (
            LineCap.ROUND if props.get("linecap") == "Keyword{round}" else LineCap.BUTT
        ),
    }


def _assert_style_eq(style, way_is_closed, josm_str):
    want = _from_josm_style(way_is_closed, josm_str)
    got_dashes = tuple(style.dashes) if style.dashes is not None else None
    got_cap = style.line_cap if style.line_cap is not None else LineCap.BUTT
    assert style.z_index == want["z_index"], (style.z_index, want["z_index"])
    assert style.color == want["color"], (style.color, want["color"])
    assert style.fill_color == want["fill_color"]
    assert style.opacity == want["opacity"]
    assert style.fill_opacity == want["fill_opacity"]
    assert style.width == want["width"]
    assert got_dashes == want["dashes"], (got_dashes, want["dashes"])
    assert got_cap == want["line_cap"], (got_cap, want["line_cap"])


def test_styling_josm_golden(tmp_path):
    reader = _build_fixture(tmp_path)
    styler = Styler(parse_file(MAPNIK_DIR, "mapnik.mapcss"), "josm")

    t18 = coords_to_max_zoom_tile(_LAT, _LON)
    entities = reader.get_entities_in_tile_with_neighbors(Tile(18, t18.x, t18.y))
    named = [w for w in entities.ways if w.tags().get_by_key("name") is not None]
    assert len(named) == 5
    styled = styler.style_entities(named, 18, False)

    def get_styles(osm_id):
        return [s for (e, s) in styled if e.global_id == osm_id]

    # JOSM dump strings copied verbatim from test_mapcss_styler.rs:44-76.
    s1 = get_styles(23_369_934)
    assert len(s1) == 6
    _assert_style_eq(
        s1[0], False,
        "Cascade{ color:#bbbbbb; linecap:Keyword{round}; linejoin:Keyword{round}; width:16.0; z-index:-1.0; }",
    )
    _assert_style_eq(
        s1[1], False,
        "Cascade{ color:Keyword{white}; dashes:[4.0, 2.0]; linecap:Keyword{round}; linejoin:Keyword{round}; width:13.0; }",
    )
    _assert_style_eq(
        s1[2], False,
        "Cascade{ color:#6c70d5; dashes:[0.0, 12.0, 10.0, 152.0]; linejoin:Keyword{bevel}; width:1.0; z-index:15.0; }",
    )
    _assert_style_eq(
        s1[3], False,
        "Cascade{ color:#6c70d5; dashes:[0.0, 12.0, 9.0, 153.0]; linejoin:Keyword{bevel}; width:2.0; z-index:15.1; }",
    )
    _assert_style_eq(
        s1[4], False,
        "Cascade{ color:#6c70d5; dashes:[0.0, 18.0, 2.0, 154.0]; linejoin:Keyword{bevel}; width:3.0; z-index:15.2; }",
    )
    _assert_style_eq(
        s1[5], False,
        "Cascade{ color:#6c70d5; dashes:[0.0, 18.0, 1.0, 155.0]; linejoin:Keyword{bevel}; width:4.0; z-index:15.3; }",
    )

    # test_mapcss_styler.rs:78-88.
    s2 = get_styles(373_569_473)
    assert len(s2) == 2
    _assert_style_eq(
        s2[0], False,
        "Cascade{ color:Keyword{grey}; linecap:Keyword{round}; linejoin:Keyword{round}; width:9.0; z-index:-1.0; }",
    )
    _assert_style_eq(
        s2[1], False,
        "Cascade{ color:#ededed; linecap:Keyword{round}; linejoin:Keyword{round}; width:8.0; }",
    )

    # test_mapcss_styler.rs:90-99 (buildings share one JOSM cascade).
    building_josm_style = (
        "Cascade{ color:#330066; fill-color:#bca9a9; fill-opacity:0.9; "
        "linejoin:Keyword{miter}; width:0.2; z-index:-900.0;"
    )
    for osm_id in (31_497_212, 31_482_164, 44_642_919):
        styles = get_styles(osm_id)
        assert styles, osm_id
        _assert_style_eq(styles[0], True, building_josm_style)
