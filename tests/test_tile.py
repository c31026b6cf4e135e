"""Projection golden vectors from the reference doc-tests (`tile.rs:23-87`)."""

import numpy as np

from osm_renderer_tpu.core import (
    Tile,
    TileRange,
    coords_to_max_zoom_tile,
    coords_to_xy,
    tile_to_max_zoom_tile_range,
)


def test_coords_to_max_zoom_tile():
    assert coords_to_max_zoom_tile(55.747764, 37.437745) == Tile(18, 158333, 81957)
    assert coords_to_max_zoom_tile(40.1222, 20.6852) == Tile(18, 146134, 99125)
    assert coords_to_max_zoom_tile(-35.306536, 149.126545) == Tile(18, 239662, 158582)


def test_tile_to_max_zoom_tile_range():
    assert tile_to_max_zoom_tile_range(Tile(0, 0, 0)) == TileRange(0, 262143, 0, 262143)
    assert tile_to_max_zoom_tile_range(Tile(15, 19805, 10244)) == TileRange(
        158440, 158447, 81952, 81959
    )
    assert tile_to_max_zoom_tile_range(Tile(18, 239662, 158582)) == TileRange(
        239662, 239662, 158582, 158582
    )


def _floor_u32(v):
    return int(np.uint32(np.trunc(v)))


def test_coords_to_xy():
    cases = [
        ((55.747764, 37.437745), 5, (4947, 2561)),
        ((55.747764, 37.437745), 18, (40533333, 20981065)),
        ((40.1222, 20.6852), 0, (142, 96)),
        ((-35.306536, 149.126545), 10, (239662, 158582)),
    ]
    for (lat, lon), zoom, (ex, ey) in cases:
        x, y = coords_to_xy(lat, lon, zoom)
        assert _floor_u32(x) == ex
        assert _floor_u32(y) == ey


def test_coords_to_xy_vectorized():
    lats = np.array([55.747764, 40.1222, -35.306536])
    lons = np.array([37.437745, 20.6852, 149.126545])
    x, y = coords_to_xy(lats, lons, 18)
    assert x.shape == (3,)
    sx, sy = coords_to_xy(55.747764, 37.437745, 18)
    assert x[0] == sx and y[0] == sy
