"""Device-resident chunk-arena path (parallel/arena.py).

The arena path must produce byte-identical output to the plain
concat-and-upload path: same kernel, same per-chunk values — only the
transport differs (one packed small-field upload + device-side row
gather instead of re-shipping every chunk array).
"""

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer

import os

STYLESHEET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "stylesheets", "default.mapcss",
)


@pytest.fixture(scope="module")
def styled_tiles(tmp_path_factory):
    from tests.fixtures import build_mini_reader

    tmp = tmp_path_factory.mktemp("arena")
    reader = build_mini_reader(tmp)
    base, name = os.path.split(STYLESHEET)
    styler = Styler(parse_file(base, name), "josm")
    zt = sorted(
        set(zip((reader.tiles["x"] >> 3).tolist(), (reader.tiles["y"] >> 3).tolist()))
    )[:4]
    tiles = [Tile(15, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    return styler, te, tiles


def _renderer(styler, **kw):
    return BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=16, **kw
    )


def test_arena_matches_concat_path(styled_tiles):
    styler, te, tiles = styled_tiles
    plain = _renderer(styler)
    arena = _renderer(styler, arena=True)

    ref = np.asarray(plain.render_prepared_planar(plain.prepare(te, scale=1)))

    prep = arena.prepare(te, scale=1)
    assert prep.batch is None and prep.arena_packed is not None
    got = np.asarray(arena.render_prepared_planar(prep))
    np.testing.assert_array_equal(got, ref)

    # Warm pass: cache hits, no entities — still identical.
    prep2 = arena.prepare([(None, t) for t in tiles], scale=1)
    got2 = np.asarray(arena.render_prepared_planar(prep2))
    np.testing.assert_array_equal(got2, ref)


def test_arena_eviction_and_reinsert(styled_tiles):
    styler, te, tiles = styled_tiles
    plain = _renderer(styler)
    ref = np.asarray(plain.render_prepared_planar(plain.prepare(te, scale=1)))

    # Cache of 2 over a 4-tile batch: every prepare evicts, frees arena
    # rows, and re-inserts into recycled rows.
    small = BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=2,
        arena=True,
    )
    for _ in range(3):
        got = np.asarray(small.render_prepared_planar(small.prepare(te, scale=1)))
        np.testing.assert_array_equal(got, ref)
    # Rows were actually recycled (freed or reused), not leaked.
    used = small.chunk_arena._tail - 1 - sum(
        n for _, n in small.chunk_arena._free
    )
    per_tile = [small.chunk_arena.offset(k)[1] for k in small.chunk_arena._offsets]
    assert used == sum(per_tile)


def test_arena_growth(styled_tiles):
    styler, te, tiles = styled_tiles
    plain = _renderer(styler)
    ref = np.asarray(plain.render_prepared_planar(plain.prepare(te, scale=1)))

    grower = _renderer(styler, arena=True)
    grower.chunk_arena.min_cap = 8  # force several growth steps
    got = np.asarray(grower.render_prepared_planar(grower.prepare(te, scale=1)))
    np.testing.assert_array_equal(got, ref)
    assert grower.chunk_arena.cap >= grower.chunk_arena._tail


def test_arena_generation_guard(styled_tiles):
    styler, te, tiles = styled_tiles
    arena = _renderer(styler, arena=True)
    prep = arena.prepare(te, scale=1)
    arena.cache_clear()
    with pytest.raises(ValueError):
        arena.render_prepared_planar(prep)


def test_arena_tile_bucket_padding(styled_tiles):
    styler, te, tiles = styled_tiles
    plain = BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=16,
        tile_bucket=True,
    )
    bucketed = BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=16,
        tile_bucket=True, arena=True,
    )
    sub = te[:3]  # pads to 4
    ref = np.asarray(plain.render_prepared_planar(plain.prepare(sub, scale=1)))
    got = np.asarray(bucketed.render_prepared_planar(bucketed.prepare(sub, scale=1)))
    np.testing.assert_array_equal(got, ref)


def test_arena_matches_concat_path_2x(styled_tiles):
    """Arena path at @2x (ts=512): per-scale tile keys, item widths and
    pattern tables must round-trip the arena identically to the plain
    concat path."""
    styler, te, tiles = styled_tiles
    sub = te[:2]
    plain = _renderer(styler)
    arena = _renderer(styler, arena=True)
    ref = np.asarray(plain.render_prepared_planar(plain.prepare(sub, scale=2)))
    prep = arena.prepare(sub, scale=2)
    assert prep.batch is None and prep.ts == 512
    got = np.asarray(arena.render_prepared_planar(prep))
    np.testing.assert_array_equal(got, ref)
    # Mixed-scale serving on one renderer: 1x after 2x still matches.
    ref1 = np.asarray(plain.render_prepared_planar(plain.prepare(sub, scale=1)))
    got1 = np.asarray(
        arena.render_prepared_planar(arena.prepare(sub, scale=1))
    )
    np.testing.assert_array_equal(got1, ref1)
