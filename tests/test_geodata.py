"""Geodata round-trip tests (mirror of the reference's synthetic test in
`saver.rs:235-324` plus an XML import round-trip)."""

import io
import struct

import numpy as np

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata import saver as saver_mod
from osm_renderer_tpu.geodata.importer import (
    EntityStorages,
    RawNode,
    import_osm,
    postprocess_node_refs,
)
from osm_renderer_tpu.geodata.reader import GeodataReader


def test_synthetic_tile_query(tmp_path):
    # y = {8, 9, 13} in range for x = 1; {10, 11, 15} for x = 2;
    # {11, 12, 14} for x = 7; nothing for x = 4, 5.
    tile_ids = [
        (1, 7, False), (1, 8, True), (1, 9, True), (1, 13, True),
        (2, 10, True), (2, 11, True), (2, 15, True), (2, 16, False), (2, 17, False),
        (4, 1, False), (4, 4, False),
        (5, 20, False), (5, 23, False), (5, 200, False),
        (7, 6, False), (7, 11, True), (7, 12, True), (7, 14, True),
        (7, 16, False), (7, 17, False),
    ]
    good_node_ids = [i for i, (_, _, good) in enumerate(tile_ids) if good]

    buf = io.BytesIO()
    data = saver_mod._BufferedData()

    nodes = [RawNode(global_id=i, lat=1.0, lon=1.0) for i in range(len(tile_ids))]
    buf.write(struct.pack("<I", len(nodes)))
    for n in nodes:
        buf.write(struct.pack("<Qdd", n.global_id, n.lat, n.lon))
        saver_mod._save_tags(buf, n.tags, data)
    buf.write(struct.pack("<I", 0))  # ways
    buf.write(struct.pack("<I", 0))  # polygons
    buf.write(struct.pack("<I", 0))  # multipolygons

    buf.write(struct.pack("<I", len(tile_ids)))
    for idx, (x, y, _) in sorted(enumerate(tile_ids), key=lambda kv: (kv[1][0], kv[1][1])):
        buf.write(struct.pack("<II", x, y))
        saver_mod._save_refs(buf, [idx], data)
        saver_mod._save_refs(buf, [], data)
        saver_mod._save_refs(buf, [], data)
    data.save(buf)

    path = tmp_path / "synthetic.bin"
    path.write_bytes(buf.getvalue())

    reader = GeodataReader.load(str(path))
    ids = reader.tile_entity_ids(Tile(15, 0, 1))
    assert sorted(ids.nodes.tolist()) == good_node_ids


OSM_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6">
  <node id="1" lat="47.1410" lon="9.5210"><tag k="amenity" v="cafe"/><tag k="name" v="K"/></node>
  <node id="2" lat="47.1412" lon="9.5212"/>
  <node id="3" lat="47.1414" lon="9.5210"/>
  <node id="4" lat="47.1412" lon="9.5208"/>
  <node id="5" lat="47.1420" lon="9.5220"/>
  <node id="6" lat="47.1425" lon="9.5230"/>
  <node id="10" lat="47.1400" lon="9.5200"/>
  <node id="11" lat="47.1400" lon="9.5240"/>
  <node id="12" lat="47.1430" lon="9.5240"/>
  <node id="13" lat="47.1430" lon="9.5200"/>
  <node id="20" lat="47.1410" lon="9.5215"/>
  <node id="21" lat="47.1410" lon="9.5225"/>
  <node id="22" lat="47.1418" lon="9.5225"/>
  <node id="23" lat="47.1418" lon="9.5215"/>
  <way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
    <tag k="building" v="yes"/></way>
  <way id="101"><nd ref="5"/><nd ref="6"/><nd ref="6"/><nd ref="5"/>
    <tag k="highway" v="residential"/><tag k="name" v="Main St"/></way>
  <way id="102"><nd ref="10"/><nd ref="11"/><nd ref="12"/><nd ref="13"/><nd ref="10"/></way>
  <way id="103"><nd ref="20"/><nd ref="21"/><nd ref="22"/><nd ref="23"/><nd ref="20"/></way>
  <relation id="200">
    <member type="way" ref="102" role="outer"/>
    <member type="way" ref="103" role="inner"/>
    <tag k="type" v="multipolygon"/><tag k="natural" v="water"/>
  </relation>
</osm>
"""


def test_import_roundtrip(tmp_path):
    osm_path = tmp_path / "mini.osm"
    osm_path.write_text(OSM_XML)
    bin_path = tmp_path / "mini.bin"
    import_osm(str(osm_path), str(bin_path))

    reader = GeodataReader.load(str(bin_path))
    assert len(reader.nodes) == 14
    assert len(reader.ways) == 4
    assert len(reader.mps) == 1

    # Way 101 is 5->6, 6->6, 6->5: the duplicated (6,5) pair is removed.
    way101 = next(
        w
        for w in (reader_way(reader, i) for i in range(len(reader.ways)))
        if w.global_id == 101
    )
    assert way101.node_count() == 3
    assert way101.tags().get_by_key("highway") == "residential"
    assert way101.tags().get_by_key("name") == "Main St"
    assert way101.tags().get_by_key("nope") is None

    # Query the tile around the fixture: everything should be found.
    from osm_renderer_tpu.core.tile import coords_to_max_zoom_tile

    t = coords_to_max_zoom_tile(47.1412, 9.5215)
    entities = reader.get_entities_in_tile_with_neighbors(Tile(16, t.x >> 2, t.y >> 2))
    assert {w.global_id for w in entities.ways} == {100, 101, 102, 103}
    assert len(entities.multipolygons) == 1
    mp = entities.multipolygons[0]
    assert mp.global_id == 200
    assert mp.polygon_count() == 2
    assert mp.tags().get_by_key("natural") == "water"
    # Rings are closed.
    for pi in range(mp.polygon_count()):
        poly = mp.get_polygon(pi)
        assert poly.node_ids[0] == poly.node_ids[-1]

    # osm_ids filter.
    only = reader.get_entities_in_tile_with_neighbors(
        Tile(16, t.x >> 2, t.y >> 2), osm_ids={100}
    )
    assert [w.global_id for w in only.ways] == [100]
    assert only.nodes == [] and only.multipolygons == []


def reader_way(reader, i):
    from osm_renderer_tpu.geodata.reader import Way

    return Way(reader, i)


def test_postprocess_node_refs():
    assert postprocess_node_refs([]) == []
    assert postprocess_node_refs([1, 2, 2, 1]) == [1, 2, 2]
    assert postprocess_node_refs([1, 2, 3, 2, 1]) == [1, 2, 3]
    assert postprocess_node_refs([1, 2, 3, 1]) == [1, 2, 3, 1]


def test_antimeridian_neighbor_fetch_no_wraparound(tmp_path):
    """Neighbor fetch at the antimeridian: the reference computes the
    x-1 neighbor of column 0 via u32 wraparound (`reader.rs:66-73`),
    which lands outside the stored z18 tile space and so finds nothing;
    this implementation clamps at 0 with the same observable result.
    Entities across the antimeridian must NOT leak into the 3x3
    neighborhood, and edge queries must not error."""
    west = "<node id='1' lat='10.0' lon='-179.99999'><tag k='amenity' v='cafe'/></node>"
    east = "<node id='2' lat='10.0' lon='179.99999'><tag k='amenity' v='pub'/></node>"
    osm = tmp_path / "am.osm"
    osm.write_text(
        f"<?xml version='1.0' encoding='UTF-8'?><osm version='0.6'>{west}{east}</osm>"
    )
    bin_path = str(tmp_path / "am.bin")
    import_osm(str(osm), bin_path)
    reader = GeodataReader.load(bin_path)

    from osm_renderer_tpu.core.tile import MAX_ZOOM, coords_to_max_zoom_tile

    zoom = 10
    shift = MAX_ZOOM - zoom
    t_west = coords_to_max_zoom_tile(10.0, -179.99999)
    t_east = coords_to_max_zoom_tile(10.0, 179.99999)
    tw = Tile(zoom, t_west.x >> shift, t_west.y >> shift)
    te = Tile(zoom, t_east.x >> shift, t_east.y >> shift)
    assert tw.x == 0 and te.x == (1 << zoom) - 1

    got_w = reader.get_entities_in_tile_with_neighbors(tw)
    ids_w = {n.global_id for n in got_w.nodes}
    assert ids_w == {1}, ids_w  # west node only; no wraparound to the east

    got_e = reader.get_entities_in_tile_with_neighbors(te)
    ids_e = {n.global_id for n in got_e.nodes}
    assert ids_e == {2}, ids_e
