"""Scale-pressure serving sweep (BASELINE config-5 analogue).

The reference serves any-size extracts with flat per-request behavior
(`reader.rs:60-100` is size-independent).  This framework's warm path
carries mutable serving state — the per-tile chunk cache, the
device-resident arena (slab allocator: eviction, free-list coalescing,
generation guards) and the sub-batch splitter — so a sweep has to
PROVE that sustained mixed-zoom traffic under deliberately tiny caches
serves pixel-identical tiles and leaks nothing.

CPU-tractable scale (interpret-mode Pallas): ~80 mixed-zoom tiles in
shuffled batches with an 8-tile chunk cache and a 256-row arena, vs an
unpressured control service.  The real-extract-size throughput sweep
(hundreds of z15 tiles on hardware) is tools/scale_sweep.py, run on the
TPU and recorded in BASELINE.md.
"""

import io
import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.importer import import_osm
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.server.http import TileService

from tests.conftest import REPO_ROOT

STYLESHEET_DIR = os.path.join(REPO_ROOT, "assets", "stylesheets")


def _decode(png: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))


@pytest.mark.slow
def test_scale_pressure_sweep_matches_unpressured(tmp_path):
    from osm_renderer_tpu.parallel.arena import ChunkArena
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    import subprocess
    import sys

    osm = os.path.join(str(tmp_path), "city.osm")
    subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "make_fixture.py"),
         osm, "--blocks", "24"],
        check=True,
    )
    binf = os.path.join(str(tmp_path), "city.bin")
    import_osm(osm, binf)
    reader = GeodataReader.load(binf)

    # Mixed-zoom tile list: all of z14, a spread of z15/z16.
    tiles = []
    for zoom, cap in ((14, 99), (15, 24), (16, 24)):
        sh = 18 - zoom
        zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                            (reader.tiles["y"] >> sh).tolist())))
        step = max(1, len(zt) // cap)
        tiles += [Tile(zoom, x, y) for x, y in zt[::step][:cap]]
    rng = np.random.default_rng(0)
    order = rng.permutation(len(tiles))

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")

    def make_service(cache_tiles: int, arena_rows: int) -> TileService:
        svc = TileService(binf, styler, STYLESHEET_DIR, backend="device")
        svc.devices = (svc.devices or [None])[:1]
        svc.batch_renderer = BatchRenderer(
            styler, backend="pallas", interpret=True,
            stylesheet_dir=STYLESHEET_DIR, tile_bucket=True,
            chunk_cache_tiles=cache_tiles, arena=True,
        )
        if arena_rows:
            svc.batch_renderer.chunk_arena = ChunkArena(min_cap=arena_rows)
        return svc

    # Pressured: 8-tile chunk cache over ~80 live tiles, 256-row arena
    # (a dense tile is ~30-40 rows, so eviction + reuse fire every
    # batch), streamed in small sub-batches.
    pressured = make_service(cache_tiles=8, arena_rows=256)
    pressured.COLD_SUB = 4
    control = make_service(cache_tiles=4096, arena_rows=0)

    got = {}
    B = 6
    for start in range(0, len(order), B):
        batch = [tiles[i] for i in order[start : start + B]]
        pngs = pressured.render_tiles_device([(t, 1) for t in batch])
        for t, p in zip(batch, pngs):
            got[(t.zoom, t.x, t.y)] = p
        if start == 3 * B:
            # Mid-sweep invalidation: the generation guard must keep
            # in-flight state coherent across a full cache clear.
            pressured.batch_renderer.cache_clear()

    arena = pressured.batch_renderer.chunk_arena
    live = sum(n for _, n in arena._offsets.values())
    free = sum(n for _, n in arena._free)
    # No leak: every allocated row is either live or on the free list.
    assert live + free == arena._tail - 1, (live, free, arena._tail)
    # Eviction really happened (the cache is 8 tiles over ~80 served)
    # and the arena stayed bounded instead of growing per-request.
    assert len(arena._offsets) <= 8 + 1
    assert arena.cap <= 1024, arena.cap
    # Coalescing keeps the free list from fragmenting into per-tile
    # shards: it must be far shorter than the number of evictions.
    assert len(arena._free) < 24, len(arena._free)

    # Serve the same tiles on the unpressured control service and
    # compare pixels (containers may legitimately differ: PNG-8 vs RGB
    # depends on palette-learning timing).
    for start in range(0, len(order), 16):
        batch = [tiles[i] for i in order[start : start + 16]]
        pngs = control.render_tiles_device([(t, 1) for t in batch])
        for t, p in zip(batch, pngs):
            a = _decode(got[(t.zoom, t.x, t.y)])
            b = _decode(p)
            np.testing.assert_array_equal(a, b, err_msg=str(t))
