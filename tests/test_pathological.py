"""Pathology-at-density: the malformed content real extracts carry,
spread across a whole synthetic city, run through the FULL pipeline —
import -> style -> render -> device/oracle parity (VERDICT r3 item 8).

`tools/make_fixture.py --pathological` injects city-wide:
self-intersecting (bowtie) building rings, self-touching figure-eight
park rings, ways with repeated node pairs / zero-length segments,
degenerate (1-node, all-identical) ways, four 1,000-node transect ways
crossing hundreds of z18 tile columns, multipolygon relations with
unmatched outer segments (must drop with a warning —
`find_polygons.rs:141-149`) next to valid ones whose rings arrive as
shuffled, partly reversed member ways (must assemble), and exotic tag
values (non-numeric `layer` — `styler.rs:288-298`, unicode/entity
names, ~500-char values; repeated-pair dedup — `importer.rs:334-353`).

The fast tier checks the import invariants and a CPU render sweep; the
slow tier runs the production device path (Pallas, interpret) against
the CPU oracle at <= 1/255 over tiles dense with the pathologies.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw.drawer import CpuDrawer
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler

from tests.conftest import REPO_ROOT

STYLESHEET_DIR = os.path.join(REPO_ROOT, "assets", "stylesheets")

# Counts wired into tools/make_fixture.py --pathological.
N_BROKEN_MULTIPOLYGONS = 8
N_SPLIT_MULTIPOLYGONS = 8
N_TRANSECTS = 4


def _patho_reader():
    from osm_renderer_tpu.geodata.importer import import_osm
    from osm_renderer_tpu.geodata.reader import GeodataReader

    import osm_renderer_tpu.geodata.find_polygons as fp_mod
    import osm_renderer_tpu.geodata.importer as imp_mod
    import osm_renderer_tpu.geodata.saver as sav_mod

    gen = os.path.join(REPO_ROOT, "tools", "make_fixture.py")
    osm = os.path.join(tempfile.gettempdir(), "osmr_patho_city.osm")
    if not os.path.exists(osm) or os.path.getmtime(osm) < os.path.getmtime(gen):
        subprocess.run(
            [sys.executable, gen, osm, "--blocks", "14", "--pathological"],
            check=True,
        )
    bin_path = os.path.join(tempfile.gettempdir(), "osmr_patho_city.bin")
    # The cached .bin must also be invalidated by importer-pipeline code
    # changes, or a stale /tmp artifact from an earlier session could
    # mask (or fake) importer regressions.
    src_mtime = max(
        os.path.getmtime(osm),
        os.path.getmtime(imp_mod.__file__),
        os.path.getmtime(fp_mod.__file__),
        os.path.getmtime(sav_mod.__file__),
    )
    if not os.path.exists(bin_path) or os.path.getmtime(bin_path) < src_mtime:
        import_osm(osm, bin_path)
    return GeodataReader.load(bin_path)


def _central_tiles(reader, zoom, k=1):
    """The k x k tile block at the center of the fixture's extent."""
    tx = reader.tiles["x"] >> (18 - zoom)
    ty = reader.tiles["y"] >> (18 - zoom)
    u = sorted(set(zip(tx.tolist(), ty.tolist())))
    cx, cy = u[len(u) // 2]
    return [Tile(zoom, cx + dx, cy + dy) for dy in range(k) for dx in range(k)]


def test_import_invariants():
    """Broken multipolygons drop, split ones assemble, degenerate ways
    survive with repeated pairs deduped, transects index many tiles."""
    from osm_renderer_tpu.geodata.reader import Multipolygon, Way

    reader = _patho_reader()

    # The plain city carries 1 valid relation (the river); --pathological
    # adds 8 broken (dropped) + 8 split-and-shuffled (assembled).
    assert len(reader.mps) == 1 + N_SPLIT_MULTIPOLYGONS

    # Every split multipolygon must have assembled its outer ring AND its
    # two-piece inner hole: >= 2 polygons each for the 8 synthetic ones.
    n_with_hole = sum(
        1
        for i in range(len(reader.mps))
        if len(Multipolygon(reader, i).polygon_ids) >= 2
    )
    assert n_with_hole >= N_SPLIT_MULTIPOLYGONS

    # Transect ways kept at full length (1,000 nodes) and spread across
    # hundreds of distinct z18 tile columns in the tile index.
    way_lens = [len(Way(reader, i).node_ids) for i in range(len(reader.ways))]
    assert sum(1 for n in way_lens if n >= 1000) >= N_TRANSECTS

    # Repeated-pair ways: [a,b,a,b,b,b,a] must import as exactly
    # [a,b,b] (3 refs): the pair-SET dedup (importer.py
    # postprocess_node_refs, reference importer.rs postprocess) drops
    # every ref whose (prev, cur) pair was seen in either direction —
    # the second a (pair (b,a) seen), the second b ((a,b) seen), the
    # FIRST (b,b) is new and kept, the rest drop.  Locate those ways by
    # their name tag so a dedup regression cannot hide behind the
    # 5-node building ways.
    dup_lens = [
        len(Way(reader, i).node_ids)
        for i in range(len(reader.ways))
        if Way(reader, i).tags().get_by_key("name") == 'Dup "&<>" way'
    ]
    assert dup_lens, "pathological fixture lost its dup-pair ways"
    assert all(n == 3 for n in dup_lens), dup_lens
    # Degenerate ways (single node) survive import without crashing.
    assert any(n == 1 for n in way_lens)


def test_styler_handles_exotic_tags():
    """Non-numeric `layer`, unicode names and 500-char values flow
    through the cascade without error (reference warns and ignores —
    styler.rs:288-298)."""
    reader = _patho_reader()
    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    for tile in _central_tiles(reader, 15, k=2):
        entities = reader.get_entities_in_tile_with_neighbors(tile)
        styled = styler.style_areas(entities.ways, entities.multipolygons, 15, False)
        assert styled  # dense center: rules must fire despite the junk


def test_cpu_render_sweep():
    """The full CPU pipeline (incl. labels over unicode/長 names) renders
    pathological-density tiles without crashing, and paints content."""
    from osm_renderer_tpu.draw.labels.labeler import Labeler

    reader = _patho_reader()
    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    drawer = CpuDrawer(labeler=Labeler(icon_base_path=STYLESHEET_DIR))
    for zoom, k in ((13, 1), (15, 1), (17, 1)):
        for tile in _central_tiles(reader, zoom, k=k):
            entities = reader.get_entities_in_tile_with_neighbors(tile)
            rgb = drawer.draw_to_pixels(entities, tile, 1, styler)
            assert rgb.shape == (256, 256, 3)
            # Dense center tiles must not come out blank.
            assert len(np.unique(rgb.reshape(-1, 3), axis=0)) > 3


@pytest.mark.slow
@pytest.mark.parametrize("zoom,k,scale", [(15, 1, 1), (16, 2, 1), (18, 1, 2)])
def test_pathological_device_parity(zoom, k, scale):
    """Production device path (Pallas, interpret) vs the CPU oracle at
    <= 1/255 per channel over tiles dense with bowtie rings,
    figure-eight rings, dup-pair/zero-length ways, transects and
    reassembled multipolygons — the reference's robustness surface
    exercised under load, not one case at a time."""
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = _patho_reader()
    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    tiles = _central_tiles(reader, zoom, k=k)
    tiles_entities = [
        (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
    ]

    dev = BatchRenderer(
        styler, backend="pallas", interpret=True, stylesheet_dir=STYLESHEET_DIR
    )
    prepared = dev.prepare(tiles_entities, scale=scale)
    assert not prepared.cpu_fallback_tiles
    got = np.asarray(dev.render_prepared(prepared))

    cpu = CpuDrawer(stylesheet_dir=STYLESHEET_DIR)
    for i, (entities, t) in enumerate(tiles_entities):
        want = cpu.draw_to_pixels(entities, t, scale, styler)
        diff = np.abs(want.astype(int) - got[i].astype(int))
        assert diff.max() <= 1, f"z{zoom}@{scale}x tile {t}: max diff {diff.max()}"
