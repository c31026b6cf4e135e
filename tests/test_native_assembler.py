"""Native assembler (native/assembler.cpp): exact chunk-array equality
against the Python pipeline on real fixture tiles.

The native path is an exact transcription of assemble_tile_prims ->
stream_tile_packed -> build_tile_chunks; equality here is array-level
(geometry, aux scalars, items, paint metadata), which is strictly
stronger than pixel parity — identical chunk arrays make every
downstream device behavior identical by construction.

Profile-table note: the native wrapper registers dash profiles in paint
order (per request), the Python path lazily per packed group.  Both
paths share one table here, native first, so lazy lookups resolve to
identical indices.
"""

import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw import primitives as prim_mod
from osm_renderer_tpu.draw.native_assembler import (
    assemble_tile_chunks_native,
    get_native,
)
from osm_renderer_tpu.draw.primitives import assemble_tile_prims
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.ops import render_pallas as RP

pytestmark = pytest.mark.skipif(
    get_native() is None, reason="native assembler unavailable"
)

FIXTURE = "assets/fixtures/minicity.bin"


@pytest.fixture(scope="module")
def env():
    if not os.path.exists(FIXTURE):
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, "tools/make_fixture.py", "assets/fixtures/minicity.osm",
             "--blocks", "24"],
            check=True,
        )
        from osm_renderer_tpu.geodata.importer import import_osm

        import_osm("assets/fixtures/minicity.osm", FIXTURE)
    reader = GeodataReader.load(FIXTURE)
    base, name = os.path.split("assets/stylesheets/default.mapcss")
    styler = Styler(parse_file(base, name), "josm")
    return reader, styler


def _tiles(reader, zoom, limit):
    sh = 18 - zoom
    xs = reader.tiles["x"] >> sh
    ys = reader.tiles["y"] >> sh
    return [
        Tile(zoom, x, y) for x, y in sorted(set(zip(xs.tolist(), ys.tolist())))
    ][:limit]


@pytest.mark.parametrize("zoom,limit,scale", [(15, 8, 1), (13, 3, 1), (16, 4, 2)])
def test_chunks_match_python(env, zoom, limit, scale):
    reader, styler = env
    ts_px = 256 * scale
    for tile in _tiles(reader, zoom, limit):
        entities = reader.get_entities_in_tile_with_neighbors(tile)
        profiles = prim_mod.ProfileTable()
        patterns = prim_mod.PatternTable(None, ts_px)
        got = assemble_tile_chunks_native(
            entities, tile, float(scale), styler, profiles, patterns, ts_px
        )
        assert got is not None
        tc_native, icon_native = got

        prims = assemble_tile_prims(entities, tile, float(scale), styler)
        stream = prim_mod.stream_tile_packed(prims, profiles, RP.CH, patterns)
        tc_py = RP.build_tile_chunks(stream, ts_px, profiles.chain_free_mask())

        assert icon_native == stream.has_icon_fills
        assert tc_native.kind.shape == tc_py.kind.shape, (
            f"{tile}: {tc_native.kind.shape} vs {tc_py.kind.shape}"
        )
        for field in tc_py._fields:
            a = getattr(tc_native, field)
            b = getattr(tc_py, field)
            if field == "items":
                w = max(a.shape[2], b.shape[2])

                def padw(x):
                    return np.pad(
                        x, ((0, 0), (0, 0), (0, w - x.shape[2])),
                        constant_values=-1,
                    )

                a, b = padw(a), padw(b)
            np.testing.assert_array_equal(
                a, b, err_msg=f"{tile} field {field}"
            )


def test_throughput_smoke(env):
    """The native path must be much faster than Python; sanity-bound it."""
    import time

    reader, styler = env
    tiles = _tiles(reader, 15, 8)
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    profiles = prim_mod.ProfileTable()
    patterns = prim_mod.PatternTable(None, 256)
    # warm style cache
    for entities, tile in te:
        assemble_tile_chunks_native(entities, tile, 1.0, styler, profiles, patterns, 256)
    t0 = time.perf_counter()
    for entities, tile in te:
        assemble_tile_chunks_native(entities, tile, 1.0, styler, profiles, patterns, 256)
    dt = (time.perf_counter() - t0) / len(te)
    assert dt < 0.05, f"native assembly too slow: {dt*1e3:.1f} ms/tile"
