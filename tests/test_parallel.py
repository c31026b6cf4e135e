"""Multi-chip tile sharding over a virtual 8-device mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
from osm_renderer_tpu.mapcss.parser import parse_string
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer

from tests.fixtures import build_mini_reader

STYLE = """
canvas { fill-color: #f1eee8; }
way[building] { fill-color: #d9d0c9; z-index: 5; }
way[highway] { color: #ffffff; width: 3; casing-color: #999999; casing-width: 1; }
area[natural=water] { fill-color: #b5d0d0; }
"""


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_batch_matches_single_device():
    # Small synthetic batch (GSPMD compile of the full scan program is
    # slow on the CPU test backend, so keep the program tiny).
    import importlib.util
    import os

    import jax.numpy as jnp
    from tests.conftest import REPO_ROOT
    from osm_renderer_tpu.ops.render_jnp import TileBatch, render_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(REPO_ROOT, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    batch, chunk = mod._example_batch(n_tiles=8)
    canvas = jnp.asarray(np.array([0.9, 0.9, 0.9], dtype=np.float32))

    got_single = np.asarray(render_batch(batch, canvas, 256, chunk, "fast"))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    sharded = TileBatch(
        *(
            jax.device_put(a, rep if name in ("profiles", "profile_total", "patterns") else dp)
            for name, a in zip(TileBatch._fields, batch)
        )
    )
    assert len(sharded.geom.sharding.device_set) == 8
    got_sharded = np.asarray(render_batch(sharded, canvas, 256, chunk, "fast"))
    assert np.array_equal(got_single, got_sharded)


def test_entry_points():
    import importlib.util
    import os

    from tests.conftest import REPO_ROOT

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO_ROOT, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = np.asarray(fn(*args))
    assert out.shape == (2, 256, 256, 3)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_mesh_tile_renderer_pallas_interpret(tmp_path):
    from osm_renderer_tpu.parallel.renderer import MeshTileRenderer

    reader = build_mini_reader(tmp_path)
    styler = Styler(parse_string(STYLE), "josm")
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tiles = [
        Tile(16, (t18.x >> 2) + dx, (t18.y >> 2) + dy)
        for dx in range(2)
        for dy in range(2)
    ]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]

    single = MeshTileRenderer(styler, devices=jax.devices()[:1], interpret=True)
    multi = MeshTileRenderer(styler, devices=jax.devices()[:4], interpret=True)
    a = single.render(te, 1)
    b = multi.render(te, 1)
    assert np.array_equal(a, b)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_multi_device_serving_matches_single(tmp_path):
    """The PRODUCTION multi-chip serving path — TileService's
    _render_group_multi with per-chip BatchRenderers, device-pinned
    chunk arenas and the RLE readback — must serve bytes identical to
    the 1-device server, warm and cold."""
    import os

    from osm_renderer_tpu.parallel.renderer import BatchRenderer
    from osm_renderer_tpu.server.http import TileService
    from tests.conftest import REPO_ROOT
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)
    sd = os.path.join(REPO_ROOT, "assets", "stylesheets")
    from osm_renderer_tpu.mapcss.parser import parse_file

    styler = Styler(parse_file(sd, "default.mapcss"), "josm")

    def mk(n_dev):
        svc = TileService(bin_path, styler, sd, backend="device")
        svc.devices = jax.devices()[:n_dev]
        svc.batch_renderers = [
            BatchRenderer(
                styler, backend="pallas", interpret=True, stylesheet_dir=sd,
                tile_bucket=True, chunk_cache_tiles=64, arena=True,
                device=d if n_dev > 1 else None,
            )
            for d in svc.devices
        ]
        svc.batch_renderer = svc.batch_renderers[0]
        return svc

    one = mk(1)
    many = mk(8)
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    base = Tile(16, t18.x >> 2, t18.y >> 2)
    tiles = [
        Tile(16, base.x + dx, base.y + dy) for dx in range(2) for dy in range(2)
    ] + [Tile(15, base.x >> 1, base.y >> 1)]
    reqs = [(t, 1) for t in tiles]

    cold_one = one.render_tiles_device(reqs)
    cold_many = many.render_tiles_device(reqs)
    assert cold_one == cold_many  # byte-identical PNGs, cold
    # Warm pass: chunk caches + arenas hit on every chip.
    # (PNG-cache bypass: query the render path directly again.)
    one._png_cache.clear()
    many._png_cache.clear()
    warm_one = one.render_tiles_device(reqs)
    warm_many = many.render_tiles_device(reqs)
    assert warm_one == warm_many == cold_one
    # The multi service really used more than one renderer (stable
    # mapping spread the tiles).
    used = {many._dev_idx(t) for t in tiles}
    assert len(used) > 1
    # ... and the used renderers' arenas hold rows (the warm path ran
    # the arena program, not the fallback).
    for d in used:
        arena = many.batch_renderers[d].chunk_arena
        assert arena is not None and len(arena._offsets) > 0
