"""Adversarial import/render fixtures (VERDICT r2 item 6).

Hand-authored OSM inputs with the pathologies real extracts carry —
unmatched multipolygon segments, self-touching rings, repeated node
pairs, very long ways crossing hundreds of max-zoom tiles, zero-length
segments, exotic tag values — asserting the importer warns-and-survives
and the render pipeline stays consistent, mirroring the reference's
robustness behaviors (`find_polygons.rs:141-149`,
`importer.rs:334-353`, `styler.rs:288-298`).
"""

import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
from osm_renderer_tpu.geodata.importer import import_osm
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler


BASE_LAT, BASE_LON = 47.1400, 9.5200


def _nodes(coords, start_id=1):
    return "".join(
        f'<node id="{start_id + i}" lat="{lat}" lon="{lon}"/>'
        for i, (lat, lon) in enumerate(coords)
    )


def _imp(tmp_path, body, name="adv"):
    osm = tmp_path / f"{name}.osm"
    osm.write_text(
        f"<?xml version='1.0' encoding='UTF-8'?><osm version='0.6'>{body}</osm>"
    )
    out = tmp_path / f"{name}.bin"
    import_osm(str(osm), str(out))
    return GeodataReader.load(str(out))


def _styler():
    base, name = os.path.split("assets/stylesheets/default.mapcss")
    return Styler(parse_file(base, name), "josm")


def _render_tile(reader, styler, tile):
    """Assemble + render via the pure-numpy dense path (no device)."""
    from osm_renderer_tpu.draw.drawer import CpuDrawer

    entities = reader.get_entities_in_tile_with_neighbors(tile)
    return CpuDrawer().draw_to_pixels(entities, tile, 1, styler)


def test_unmatched_multipolygon_segment_skipped(tmp_path, capfd):
    """A relation whose segments cannot close into rings is dropped with
    a warning; everything else imports (find_polygons.rs:141-149)."""
    body = (
        _nodes(
            [
                (BASE_LAT, BASE_LON),
                (BASE_LAT, BASE_LON + 0.002),
                (BASE_LAT + 0.002, BASE_LON + 0.002),
                # dangling endpoint with no way back to the start
                (BASE_LAT + 0.004, BASE_LON + 0.004),
            ]
        )
        + '<way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>'
        + '<way id="101"><nd ref="3"/><nd ref="4"/></way>'
        + '<relation id="200"><member type="way" ref="100" role="outer"/>'
        + '<member type="way" ref="101" role="outer"/>'
        + '<tag k="type" v="multipolygon"/><tag k="natural" v="water"/></relation>'
        + '<way id="102"><nd ref="1"/><nd ref="2"/><tag k="highway" v="residential"/></way>'
    )
    reader = _imp(tmp_path, body)
    err = capfd.readouterr().err
    assert "200" in err  # warned about the dropped relation
    assert len(reader.mps) == 0
    assert len(reader.ways) == 3  # both member ways + the road import fine


def test_self_touching_ring_survives_render(tmp_path):
    """A figure-eight ring (vertex reuse) imports and renders without
    crashing; the reference's even-odd fill handles self-touching
    contours geometrically."""
    d = 0.001
    body = (
        _nodes(
            [
                (BASE_LAT, BASE_LON),
                (BASE_LAT, BASE_LON + d),
                (BASE_LAT + d, BASE_LON + d),   # pinch point (reused)
                (BASE_LAT + d, BASE_LON + 2 * d),
                (BASE_LAT + 2 * d, BASE_LON + 2 * d),
            ]
        )
        + '<way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/>'
        + '<nd ref="4"/><nd ref="5"/><nd ref="3"/><nd ref="1"/>'
        + '<tag k="building" v="yes"/></way>'
    )
    reader = _imp(tmp_path, body)
    styler = _styler()
    t = coords_to_max_zoom_tile(BASE_LAT + d, BASE_LON + d)
    rgb = _render_tile(reader, styler, Tile(16, t.x >> 2, t.y >> 2))
    assert rgb.shape == (256, 256, 3)
    assert rgb.std() > 0  # something was drawn


def test_repeated_node_pairs_deduped(tmp_path):
    """Consecutive duplicate (a, b) pairs collapse (importer.rs:334-353),
    including the b->a immediately after a->b form."""
    body = (
        _nodes([(BASE_LAT, BASE_LON), (BASE_LAT, BASE_LON + 0.001)])
        + '<way id="100"><nd ref="1"/><nd ref="2"/><nd ref="1"/><nd ref="2"/>'
        + '<nd ref="2"/><nd ref="2"/><nd ref="1"/>'
        + '<tag k="highway" v="residential"/></way>'
    )
    reader = _imp(tmp_path, body)
    way = reader.get_entities_in_tile_with_neighbors(
        Tile(
            14,
            coords_to_max_zoom_tile(BASE_LAT, BASE_LON).x >> 4,
            coords_to_max_zoom_tile(BASE_LAT, BASE_LON).y >> 4,
        )
    ).ways[0]
    ids = way.node_ids
    # The reference's seen-pair dedup on 1,2,1,2,2,2,1 keeps exactly
    # [1, 2, 2]: the (2,1)/(1,2) revisits and the second (2,2) vanish,
    # the first (2,2) self-pair stays (importer.rs:334-353).
    assert len(ids) == 3
    assert ids[1] == ids[2]  # the surviving self-pair


def test_long_way_spans_many_tiles(tmp_path):
    """A 1000-node way crossing ~200 z18 tile columns imports, lands in
    the tile index of every covered tile, and renders from a middle
    tile without the device path (view cull keeps it tractable)."""
    n = 1000
    coords = [
        (BASE_LAT, BASE_LON + 0.0002 * i) for i in range(n)
    ]  # ~0.2 degrees of longitude (~145 z18 tile columns)
    refs = "".join(f'<nd ref="{i + 1}"/>' for i in range(n))
    body = (
        _nodes(coords)
        + f'<way id="100">{refs}<tag k="highway" v="trunk"/></way>'
    )
    reader = _imp(tmp_path, body)
    t0 = coords_to_max_zoom_tile(*coords[0])
    t1 = coords_to_max_zoom_tile(*coords[-1])
    assert t1.x - t0.x > 100  # genuinely many tiles
    # Query a middle tile: the way must be found there.
    tm = coords_to_max_zoom_tile(*coords[n // 2])
    ents = reader.get_entities_in_tile_with_neighbors(Tile(18, tm.x, tm.y))
    assert [w.global_id for w in ents.ways] == [100]
    styler = _styler()
    rgb = _render_tile(reader, styler, Tile(15, tm.x >> 3, tm.y >> 3))
    assert rgb.shape == (256, 256, 3)


def test_zero_length_segments_and_degenerate_ways(tmp_path):
    """Ways collapsing to a point (all nodes identical) and one-node
    ways import without crashing and draw nothing."""
    body = (
        _nodes([(BASE_LAT, BASE_LON)])
        + '<way id="100"><nd ref="1"/><nd ref="1"/><nd ref="1"/>'
        + '<tag k="highway" v="residential"/></way>'
        + '<way id="101"><nd ref="1"/><tag k="highway" v="residential"/></way>'
    )
    reader = _imp(tmp_path, body)
    styler = _styler()
    t = coords_to_max_zoom_tile(BASE_LAT, BASE_LON)
    rgb = _render_tile(reader, styler, Tile(16, t.x >> 2, t.y >> 2))
    # Canvas only: a degenerate way paints nothing.
    assert (rgb == rgb[0, 0]).all()


def test_exotic_tag_values_warn_and_render(tmp_path, capfd):
    """Tags with values the stylesheet's numeric properties can't parse
    warn and are ignored (styler.rs:288-298); rendering continues."""
    body = (
        _nodes(
            [
                (BASE_LAT, BASE_LON),
                (BASE_LAT, BASE_LON + 0.001),
                (BASE_LAT + 0.001, BASE_LON + 0.001),
                (BASE_LAT + 0.001, BASE_LON),
            ]
        )
        + '<way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>'
        + '<tag k="building" v="yes"/>'
        + '<tag k="layer" v="&#xe9;norme"/>'  # non-numeric layer tag
        + '<tag k="name" v="&quot;&amp;&lt;&gt;é中文"/></way>'
    )
    reader = _imp(tmp_path, body)
    styler = _styler()
    t = coords_to_max_zoom_tile(BASE_LAT, BASE_LON)
    rgb = _render_tile(reader, styler, Tile(16, t.x >> 2, t.y >> 2))
    assert rgb.std() > 0  # building still filled
    way = reader.get_entities_in_tile_with_neighbors(
        Tile(16, t.x >> 2, t.y >> 2)
    ).ways[0]
    assert way.tags().get_by_key("name") == '"&<>é中文'


def test_relation_with_missing_member_way(tmp_path, capfd):
    """Relations referencing ways absent from the extract drop only the
    relation, not the import."""
    body = (
        _nodes([(BASE_LAT, BASE_LON), (BASE_LAT, BASE_LON + 0.001)])
        + '<way id="100"><nd ref="1"/><nd ref="2"/></way>'
        + '<relation id="200"><member type="way" ref="99999" role="outer"/>'
        + '<member type="way" ref="100" role="outer"/>'
        + '<tag k="type" v="multipolygon"/></relation>'
    )
    reader = _imp(tmp_path, body)
    assert len(reader.ways) == 1
    assert len(reader.mps) == 0


def test_native_assembler_on_adversarial_geometry(tmp_path):
    """The native assembler must agree with the Python path on
    adversarial content too (degenerate segs, self-touching rings)."""
    from osm_renderer_tpu.draw import primitives as prim_mod
    from osm_renderer_tpu.draw.native_assembler import (
        assemble_tile_chunks_native,
        get_native,
    )
    from osm_renderer_tpu.draw.primitives import assemble_tile_prims
    from osm_renderer_tpu.ops import render_pallas as RP

    if get_native() is None:
        pytest.skip("native assembler unavailable")
    d = 0.001
    body = (
        _nodes(
            [
                (BASE_LAT, BASE_LON),
                (BASE_LAT, BASE_LON + d),
                (BASE_LAT + d, BASE_LON + d),
                (BASE_LAT + d, BASE_LON + 2 * d),
                (BASE_LAT + 2 * d, BASE_LON + 2 * d),
            ]
        )
        + '<way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/>'
        + '<nd ref="4"/><nd ref="5"/><nd ref="3"/><nd ref="1"/>'
        + '<tag k="building" v="yes"/></way>'
        + '<way id="101"><nd ref="1"/><nd ref="1"/><nd ref="2"/>'
        + '<tag k="highway" v="residential"/></way>'
    )
    reader = _imp(tmp_path, body)
    styler = _styler()
    t = coords_to_max_zoom_tile(BASE_LAT + d, BASE_LON + d)
    tile = Tile(16, t.x >> 2, t.y >> 2)
    entities = reader.get_entities_in_tile_with_neighbors(tile)
    profiles = prim_mod.ProfileTable()
    patterns = prim_mod.PatternTable(None, 256)
    tc_native, _ = assemble_tile_chunks_native(
        entities, tile, 1.0, styler, profiles, patterns, 256
    )
    prims = assemble_tile_prims(entities, tile, 1.0, styler)
    stream = prim_mod.stream_tile_packed(prims, profiles, RP.CH, patterns)
    tc_py = RP.build_tile_chunks(stream, 256, profiles.chain_free_mask())
    for field in tc_py._fields:
        np.testing.assert_array_equal(
            getattr(tc_native, field), getattr(tc_py, field), err_msg=field
        )
