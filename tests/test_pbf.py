"""PBF import round-trip: XML fixture -> PBF encode -> decode -> same data."""

import numpy as np

from osm_renderer_tpu.geodata.importer import import_osm, parse_osm_xml
from osm_renderer_tpu.geodata.pbf import MEMBER_WAY, PbfWriter
from osm_renderer_tpu.geodata.reader import GeodataReader, Multipolygon, Way

from tests.fixtures import MINI_OSM


def test_pbf_roundtrip(tmp_path):
    osm = tmp_path / "mini.osm"
    osm.write_text(MINI_OSM)

    # Parse the XML to get raw entities, then re-encode them as PBF.
    storages = parse_osm_xml(str(osm))
    pbf_path = str(tmp_path / "mini.osm.pbf")
    w = PbfWriter(pbf_path)
    w.write_dense_nodes(
        (n.global_id, n.lat, n.lon, n.tags) for n in storages.node_storage.entities
    )
    # Ways/relations must carry GLOBAL ids in PBF.
    node_gids = [n.global_id for n in storages.node_storage.entities]
    way_gids = [wy.global_id for wy in storages.way_storage.entities]
    # The XML fixture's way node_ids were already local; rebuild global refs
    # from the original XML text instead: simpler to re-extract via xml parse
    # of raw refs (way.node_ids are local indices into node storage).
    w.write_ways(
        (wy.global_id, [node_gids[i] for i in wy.node_ids], wy.tags)
        for wy in storages.way_storage.entities
    )
    # Reconstruct the relation from the fixture (outer 102, inner 103).
    w.write_relations(
        [
            (
                200,
                [(MEMBER_WAY, 102, "outer"), (MEMBER_WAY, 103, "inner")],
                {"type": "multipolygon", "natural": "water"},
            )
        ]
    )
    w.close()

    bin_xml = str(tmp_path / "from_xml.bin")
    bin_pbf = str(tmp_path / "from_pbf.bin")
    import_osm(str(osm), bin_xml)
    import_osm(pbf_path, bin_pbf)

    rx = GeodataReader.load(bin_xml)
    rp = GeodataReader.load(bin_pbf)

    assert len(rx.nodes) == len(rp.nodes)
    assert np.array_equal(rx.nodes["id"], rp.nodes["id"])
    # PBF coordinates are quantized to 1e-7 degrees (granularity 100).
    assert np.abs(rx.nodes["lat"] - rp.nodes["lat"]).max() < 1e-7
    assert np.abs(rx.nodes["lon"] - rp.nodes["lon"]).max() < 1e-7

    assert len(rx.ways) == len(rp.ways)
    for i in range(len(rx.ways)):
        wx, wp = Way(rx, i), Way(rp, i)
        assert wx.global_id == wp.global_id
        assert np.array_equal(wx.node_ids, wp.node_ids)
        assert dict(wx.tags().items()) == dict(wp.tags().items())

    assert len(rx.mps) == len(rp.mps) == 1
    mx, mp = Multipolygon(rx, 0), Multipolygon(rp, 0)
    assert mx.polygon_count() == mp.polygon_count()
    assert dict(mx.tags().items()) == dict(mp.tags().items())

    # PBF ways with a way referencing unseen nodes: refs are skipped.
