"""HTTP server: URL contract, tile serving, /shutdown, /perf_stats."""

import asyncio
import os
import socket
import struct
import threading
import time
import urllib.request
import zlib

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.server.http import TileService, extract_tile_from_path, run_server

from tests.conftest import REPO_ROOT
from tests.fixtures import build_mini_reader

STYLESHEET_DIR = os.path.join(REPO_ROOT, "assets", "stylesheets")


def test_extract_tile_from_path():
    assert extract_tile_from_path("/15/100/200.png") == (Tile(15, 100, 200), 1)
    assert extract_tile_from_path("/tiles/15/100/200.png?nonce=7") == (
        Tile(15, 100, 200), 1,
    )
    assert extract_tile_from_path("/18/1/2@2x.png") == (Tile(18, 1, 2), 2)
    assert extract_tile_from_path("/19/1/2.png") is None  # z > MAX_ZOOM
    assert extract_tile_from_path("/a/b/c.png") is None
    assert extract_tile_from_path("/shutdown") is None


def _decode_png_size(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    reader_path = os.path.join(str(tmp), "mini.bin")
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm

    osm_path = os.path.join(str(tmp), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    import_osm(osm_path, reader_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    service = TileService(reader_path, styler, STYLESHEET_DIR, backend="cpu")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def runner():
        asyncio.run(run_server(f"127.0.0.1:{port}", service))

    thread = threading.Thread(target=runner, daemon=True)
    thread.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.05)
    yield port
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/shutdown", timeout=2)
    except Exception:
        pass
    thread.join(timeout=5)


def test_serve_tile(server_port):
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    z, x, y = 16, t18.x >> 2, t18.y >> 2
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/{z}/{x}/{y}.png", timeout=30
    ) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        assert resp.headers["Access-Control-Allow-Origin"] == "*"
        data = resp.read()
    assert _decode_png_size(data) == (256, 256)

    # @2x
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/{z}/{x}/{y}@2x.png?nonce=1", timeout=60
    ) as resp:
        data2 = resp.read()
    assert _decode_png_size(data2) == (512, 512)


def test_perf_stats_endpoint(server_port):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/perf_stats", timeout=10
    ) as resp:
        html = resp.read().decode()
    assert "perf stats" in html


def test_device_backend_service(tmp_path):
    """Device-backend TileService end to end (pallas interpret on CPU)."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    dev = TileService(bin_path, styler, STYLESHEET_DIR, backend="device")
    cpu = TileService(bin_path, styler, STYLESHEET_DIR, backend="cpu")

    # Startup warm-up pre-compiles serving signatures (and the render
    # below reuses them).
    assert dev.warmup(1) == 1

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tile = Tile(16, t18.x >> 2, t18.y >> 2)
    pngs = dev.render_tiles_device([(tile, 1)])
    assert len(pngs) == 1 and pngs[0][:8] == b"\x89PNG\r\n\x1a\n"

    # Same tile through both backends decodes to nearly identical pixels.
    from PIL import Image
    import io as _io

    a = np.asarray(Image.open(_io.BytesIO(pngs[0])).convert("RGB"))
    b = np.asarray(Image.open(_io.BytesIO(cpu.render_tile_cpu(tile, 1))).convert("RGB"))
    diff = np.abs(a.astype(int) - b.astype(int))
    # The device backend serves glyph-atlas labels (quantized phases,
    # draw/labels/atlas.py): AA glyph edges may deviate boundedly; the
    # map itself stays within 1/255.
    assert diff.max() <= 96
    assert (diff > 8).mean() < 1e-3

    # Device path records per-tile perf spans (batch shares + compose).
    html = dev.perf_stats.to_html()
    assert "Device execute (batch share)" in html
    assert "Device readback (batch share)" in html
    assert "Compose and encode" in html
    assert f"zoom {tile.zoom}" in html


def test_device_backend_multi_device_sharding(tmp_path):
    """A batch larger than one tile is split round-robin across all
    visible devices (8 virtual CPU devices in tests) and reassembled in
    request order, matching the CPU path tile-for-tile."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    dev = TileService(bin_path, styler, STYLESHEET_DIR, backend="device")
    cpu = TileService(bin_path, styler, STYLESHEET_DIR, backend="cpu")
    import jax

    assert len(dev.devices) == len(jax.devices())

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    base = Tile(16, t18.x >> 2, t18.y >> 2)
    tiles = [
        Tile(16, base.x + dx, base.y + dy) for dx in (0, 1) for dy in (0, 1)
    ] + [Tile(15, base.x >> 1, base.y >> 1)]
    pngs = dev.render_tiles_device([(t, 1) for t in tiles])
    assert len(pngs) == len(tiles)

    from PIL import Image
    import io as _io

    for t, png in zip(tiles, pngs):
        a = np.asarray(Image.open(_io.BytesIO(png)).convert("RGB"))
        b = np.asarray(Image.open(_io.BytesIO(cpu.render_tile_cpu(t, 1))).convert("RGB"))
        d = np.abs(a.astype(int) - b.astype(int))
        # Atlas-label AA edges may deviate boundedly (see above).
        assert d.max() <= 96, (t, d.max())
        assert (d > 8).mean() < 1e-3, t


def test_device_backend_cold_subbatch_pipeline(tmp_path, monkeypatch):
    """Single-device cold groups stream in pipelined sub-batches
    (assembly of sub-batch N+1 overlaps render/readback of N) with the
    chunk arena on — output must match the CPU path tile-for-tile and
    arrive in request order."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    dev = TileService(bin_path, styler, STYLESHEET_DIR, backend="device")
    cpu = TileService(bin_path, styler, STYLESHEET_DIR, backend="cpu")
    # Force the single-accelerator serving shape (tests expose 8 virtual
    # CPU devices) with the production single-device config: arena on.
    dev.devices = dev.devices[:1]
    dev.batch_renderer = BatchRenderer(
        styler, backend="pallas", interpret=True,
        stylesheet_dir=STYLESHEET_DIR, tile_bucket=True,
        chunk_cache_tiles=512, arena=True,
    )
    monkeypatch.setattr(TileService, "COLD_SUB", 2)

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    base = Tile(16, t18.x >> 2, t18.y >> 2)
    tiles = [
        Tile(16, base.x + dx, base.y + dy) for dx in (0, 1) for dy in (0, 1)
    ] + [Tile(15, base.x >> 1, base.y >> 1)]
    pngs = dev.render_tiles_device([(t, 1) for t in tiles])
    assert len(pngs) == len(tiles)

    from PIL import Image
    import io as _io

    for t, png in zip(tiles, pngs):
        a = np.asarray(Image.open(_io.BytesIO(png)).convert("RGB"))
        b = np.asarray(Image.open(_io.BytesIO(cpu.render_tile_cpu(t, 1))).convert("RGB"))
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 96, (t, d.max())
        assert (d > 8).mean() < 1e-3, t

    # Warm repeat (chunk + label caches hit, pure arena path): same
    # PIXELS as the first pass — the container may legitimately switch
    # from RGB to palette PNG-8 once the indexed wire kicks in (the
    # first batch serves from the v1 wire while the palette is being
    # learned) — and byte-identical once the format is steady.
    again = dev.render_tiles_device([(t, 1) for t in tiles])
    for p_a, p_b in zip(pngs, again):
        a = np.asarray(Image.open(_io.BytesIO(p_a)).convert("RGB"))
        b = np.asarray(Image.open(_io.BytesIO(p_b)).convert("RGB"))
        np.testing.assert_array_equal(a, b)
    third = dev.render_tiles_device([(t, 1) for t in tiles])
    assert third == again


def test_png_cache(tmp_path):
    """Device backend caches served PNGs: a repeat request is a
    byte-identical cache hit, LRU-bounded; CPU backend keeps the
    reference's render-every-request semantics."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    dev = TileService(
        bin_path, styler, STYLESHEET_DIR, backend="device", png_cache_tiles=2
    )
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    base = Tile(16, t18.x >> 2, t18.y >> 2)
    assert dev.png_cache_get(base, 1) is None
    pngs = dev.render_tiles_device([(base, 1)])
    assert dev.png_cache_get(base, 1) == pngs[0]
    # LRU bound: rendering two more tiles evicts the oldest entry.
    others = [Tile(16, base.x + 1, base.y), Tile(16, base.x, base.y + 1)]
    dev.render_tiles_device([(t, 1) for t in others])
    assert dev.png_cache_get(base, 1) is None
    assert dev.png_cache_get(others[1], 1) is not None

    cpu = TileService(
        bin_path, styler, STYLESHEET_DIR, backend="cpu", png_cache_tiles=2
    )
    assert cpu.png_cache_tiles == 0  # reference semantics preserved


def test_mixed_zoom_requests_fold_into_one_dispatch(tmp_path):
    """Chunks are zoom-agnostic, so the micro-batcher folds concurrent
    requests across zooms (same scale) into ONE device dispatch —
    sparse low-zoom traffic rides full batches instead of paying the
    per-launch dispatch floor per tile (VERDICT r4 item 7).  Output
    must be byte-equal to serving each tile alone."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    # png_cache off: the solo-serving control below must really render.
    dev = TileService(
        bin_path, styler, STYLESHEET_DIR, backend="device", png_cache_tiles=0
    )
    dev.devices = dev.devices[:1]
    dev.batch_renderer = BatchRenderer(
        styler, backend="pallas", interpret=True,
        stylesheet_dir=STYLESHEET_DIR, tile_bucket=True,
        chunk_cache_tiles=512, arena=True,
    )

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tiles = [Tile(z, t18.x >> (18 - z), t18.y >> (18 - z)) for z in range(12, 18)]

    calls = []
    orig = TileService._dispatch_group_device

    def spy(self, te, scale, t0, compacts=None):
        calls.append(len(te))
        return orig(self, te, scale, t0, compacts)

    TileService._dispatch_group_device = spy
    try:
        mixed = dev.render_tiles_device([(t, 1) for t in tiles])
    finally:
        TileService._dispatch_group_device = orig
    # One scale group, one sub-batch: a single device dispatch covered
    # all six zoom levels.
    assert calls == [len(tiles)]

    solo = [dev.render_tiles_device([(t, 1)])[0] for t in tiles]

    from PIL import Image
    import io as _io

    for t, p_m, p_s in zip(tiles, mixed, solo):
        a = np.asarray(Image.open(_io.BytesIO(p_m)).convert("RGB"))
        b = np.asarray(Image.open(_io.BytesIO(p_s)).convert("RGB"))
        np.testing.assert_array_equal(a, b, err_msg=str(t))


def test_chunk_dense_group_splits_on_device(tmp_path):
    """A warm group whose total chunk count exceeds the kernel's SMEM
    scalar-prefetch bound (MAX_BATCH_CHUNKS) must split into smaller
    device dispatches — NOT silently fall back to per-tile CPU
    rendering (tent lanes inflated per-tile chunk counts enough that a
    ~370-tile warm z17 group really overflows).  Output must be
    byte-equal to serving each tile alone."""
    from tests.fixtures import MINI_OSM
    from osm_renderer_tpu.geodata.importer import import_osm
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)

    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    dev = TileService(
        bin_path, styler, STYLESHEET_DIR, backend="device", png_cache_tiles=0
    )
    dev.devices = dev.devices[:1]
    dev.batch_renderer = BatchRenderer(
        styler, backend="pallas", interpret=True,
        stylesheet_dir=STYLESHEET_DIR, tile_bucket=True,
        chunk_cache_tiles=512, arena=True,
    )

    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    base = Tile(16, t18.x >> 2, t18.y >> 2)
    tiles = [
        Tile(16, base.x + dx, base.y + dy) for dy in range(2) for dx in range(3)
    ]
    solo = [dev.render_tiles_device([(t, 1)])[0] for t in tiles]

    # Find the real per-tile chunk counts, then set the bound so the
    # 6-tile group must split at least once but each tile still fits.
    counts = [
        dev.batch_renderer._chunk_cache[(t.zoom, t.x, t.y, 1)][0].kind.shape[0]
        for t in tiles
    ]
    dev.batch_renderer.MAX_BATCH_CHUNKS = max(counts) * 2 + 8

    splits = []
    orig = TileService._encode_split_sub

    def spy(self, *a, **kw):
        splits.append(len(a[0]))
        return orig(self, *a, **kw)

    TileService._encode_split_sub = spy
    try:
        grouped = dev.render_tiles_device([(t, 1) for t in tiles])
    finally:
        TileService._encode_split_sub = orig

    assert splits, "oversized group never took the split path"
    # Container may legitimately differ (PNG-8 vs RGB: the palette is
    # per-batch); served PIXELS must match the solo renders exactly.
    from PIL import Image
    import io as _io

    for t, p_g, p_s in zip(tiles, grouped, solo):
        a = np.asarray(Image.open(_io.BytesIO(p_g)).convert("RGB"))
        b = np.asarray(Image.open(_io.BytesIO(p_s)).convert("RGB"))
        np.testing.assert_array_equal(a, b, err_msg=str(t))
