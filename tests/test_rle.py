"""Device RLE readback encoding: lossless round-trip + native decode.

The warm serving path compresses rendered tiles on-device (ops/rle.py)
before the d2h transfer; these tests pin that the encode+decode chain
is byte-exact against the raw planar output, including the run-cap
overflow signal.
"""

import numpy as np
import pytest

from osm_renderer_tpu.ops import rle
from osm_renderer_tpu.draw.png_writer import rle_decode, rle_to_png, rgb_to_png


def _planar_from_rgb(rgb: np.ndarray) -> np.ndarray:
    """(T, ts, ts, 3) u8 -> (T, 4, ts, ts) u8."""
    T, ts = rgb.shape[0], rgb.shape[1]
    p = np.zeros((T, 4, ts, ts), np.uint8)
    p[:, :3] = rgb.transpose(0, 3, 1, 2)
    return p


def _random_tiles(rng, T=3, ts=64):
    """Map-like tiles: flat background + rectangles + noise pixels."""
    rgb = np.full((T, ts, ts, 3), 200, np.uint8)
    for t in range(T):
        for _ in range(6):
            x0, y0 = rng.integers(0, ts - 8, 2)
            w, h = rng.integers(4, 16, 2)
            rgb[t, y0 : y0 + h, x0 : x0 + w] = rng.integers(0, 255, 3)
        # AA-like isolated distinct pixels
        for _ in range(30):
            x, y = rng.integers(0, ts, 2)
            rgb[t, y, x] = rng.integers(0, 255, 3)
    return rgb


def test_rle_roundtrip_exact():
    rng = np.random.default_rng(7)
    rgb = _random_tiles(rng)
    T, ts = rgb.shape[0], rgb.shape[1]
    vals, lens, n_runs = rle.encode_device(_planar_from_rgb(rgb), rcap=4096)
    vals, lens, n_runs = map(np.asarray, (vals, lens, n_runs))
    assert (n_runs <= 4096).all()
    for t in range(T):
        dec = rle.decode_numpy(vals[t], lens[t], n_runs[t], ts)
        np.testing.assert_array_equal(dec, rgb[t])
        dec_native = rle_decode(vals[t], lens[t], int(n_runs[t]), ts, ts)
        np.testing.assert_array_equal(dec_native, rgb[t])


def test_rle_uniform_tile_single_run():
    rgb = np.full((1, 32, 32, 3), 17, np.uint8)
    vals, lens, n_runs = rle.encode_device(_planar_from_rgb(rgb), rcap=1024)
    assert int(np.asarray(n_runs)[0]) == 1
    assert int(np.asarray(lens)[0, 0]) == 32 * 32 - 1
    dec = rle.decode_numpy(np.asarray(vals)[0], np.asarray(lens)[0], 1, 32)
    np.testing.assert_array_equal(dec, rgb[0])


def test_rle_overflow_detected():
    # Worst case: every pixel distinct -> n_runs == ts*ts > rcap.
    ts = 32
    rgb = np.arange(ts * ts * 3, dtype=np.uint32).reshape(ts, ts, 3) % 251
    rgb = rgb.astype(np.uint8)[None]
    vals, lens, n_runs = rle.encode_device(_planar_from_rgb(rgb), rcap=256)
    assert int(np.asarray(n_runs)[0]) > 256  # caller must fall back to raw


def test_rle_to_png_matches_raw_png():
    rng = np.random.default_rng(3)
    rgb = _random_tiles(rng, T=1)
    ts = rgb.shape[1]
    vals, lens, n_runs = rle.encode_device(_planar_from_rgb(rgb), rcap=4096)
    png_a = rle_to_png(
        np.asarray(vals)[0], np.asarray(lens)[0], int(np.asarray(n_runs)[0]),
        ts, ts, 1,
    )
    png_b = rgb_to_png(rgb[0], 1)
    assert png_a == png_b


def test_rle_decode_rejects_bad_cover():
    vals = np.array([1, 2], np.int32)
    lens = np.array([0, 0], np.int32)  # covers 2 of 16 pixels
    with pytest.raises(ValueError):
        rle_decode(vals, lens, 2, 4, 4)


def test_wire_roundtrip_exact():
    rng = np.random.default_rng(11)
    rgb = _random_tiles(rng, T=4, ts=64)
    T, ts = rgb.shape[0], rgb.shape[1]
    wire = np.asarray(rle.encode_wire_device(_planar_from_rgb(rgb), rtot=32768))
    assert int(wire[0]) == T
    tiles = rle.decode_wire_numpy(wire, ts)
    assert tiles is not None
    for t in range(T):
        np.testing.assert_array_equal(tiles[t], rgb[t])


def test_wire_native_decode_matches():
    from osm_renderer_tpu.draw.png_writer import rle_decode_packed

    rng = np.random.default_rng(13)
    rgb = _random_tiles(rng, T=2, ts=64)
    T, ts = rgb.shape[0], rgb.shape[1]
    wire = np.asarray(rle.encode_wire_device(_planar_from_rgb(rgb), rtot=32768))
    n_runs = wire[2 : 2 + T]
    packed = wire[2 + T :]
    pos = 0
    for t in range(T):
        n = int(n_runs[t])
        dec = rle_decode_packed(packed[pos : pos + n], ts, ts)
        np.testing.assert_array_equal(dec, rgb[t])
        pos += n


def test_wire_run_lengths_fit_top_byte():
    # A fully uniform batch still decodes: long runs are split at the
    # 256-pixel forced boundaries so every length-1 fits in 8 bits.
    rgb = np.full((2, 64, 64, 3), 99, np.uint8)
    wire = np.asarray(rle.encode_wire_device(_planar_from_rgb(rgb), rtot=4096))
    T = int(wire[0])
    total = int(wire[1])
    assert total == 2 * (64 * 64 // rle.BLOCK)
    tiles = rle.decode_wire_numpy(wire, 64)
    for t in range(T):
        np.testing.assert_array_equal(tiles[t], rgb[t])


def test_wire_overflow_detected():
    ts = 64
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, size=(1, ts, ts, 3)).astype(np.uint8)
    wire = np.asarray(rle.encode_wire_device(_planar_from_rgb(rgb), rtot=128))
    assert int(wire[1]) > 128
    assert rle.decode_wire_numpy(wire, ts) is None


def test_renderer_fetch_rgb_rle_overflow_fallback():
    """BatchRenderer.fetch_rgb_rle must return exact pixels via the raw
    planar fallback when the wire cap overflows, and grow the next cap."""
    import jax.numpy as jnp

    from osm_renderer_tpu.parallel.renderer import BatchRenderer, RleRendered

    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    planar = jnp.asarray(_planar_from_rgb(rgb))
    wire = rle.encode_wire_device(planar, rtot=64)
    r = BatchRenderer.__new__(BatchRenderer)
    r._rtot_by_key = {}
    res = RleRendered(planar, wire, 64, 64)
    out = r.fetch_rgb_rle(res)
    np.testing.assert_array_equal(out, rgb)
    assert r._rtot_by_key[(64, 2)] > 64


def test_rcap_bucket():
    assert rle.rcap_bucket(1) == 1024
    assert rle.rcap_bucket(1500) == 2048
    assert rle.rcap_bucket(4096) == 4096
    assert rle.rcap_bucket(4097) == 8192


# ------------------------- indexed-color wire (v2) -------------------------


def _palette_from_rgb(rgb):
    flat = (
        rgb[..., 0].astype(np.int64) << 16
        | rgb[..., 1].astype(np.int64) << 8
        | rgb[..., 2].astype(np.int64)
    ).reshape(-1)
    colors, counts = np.unique(flat, return_counts=True)
    return rle.build_palette(colors, counts)


def test_indexed_wire_roundtrip_exact():
    rng = np.random.default_rng(11)
    rgb = _random_tiles(rng)
    ts = rgb.shape[1]
    table = _palette_from_rgb(rgb)
    wire = np.asarray(
        rle.encode_wire_indexed_device(
            np.asarray(_planar_from_rgb(rgb)), 32768, np.asarray(table)
        )
    )
    tiles = rle.decode_wire_indexed_numpy(wire, ts)
    assert tiles is not None
    for t in range(rgb.shape[0]):
        np.testing.assert_array_equal(tiles[t], rgb[t])


def test_indexed_wire_all_literal_and_native():
    """Empty palette: every run ships as a literal escape, still
    byte-exact — and the native word decoder agrees with numpy."""
    from osm_renderer_tpu.draw.png_writer import rle_decode_words

    rng = np.random.default_rng(13)
    rgb = _random_tiles(rng, T=2)
    ts = rgb.shape[1]
    empty = np.full(rle.PAL_CAP, rle.PAL_PAD, np.int32)
    wire = np.asarray(
        rle.encode_wire_indexed_device(
            np.asarray(_planar_from_rgb(rgb)), 65536, np.asarray(empty)
        )
    )
    T = int(wire[0])
    total_words = int(wire[1])
    total_runs = int(wire[2])
    assert total_words == 3 * total_runs  # all literals
    tiles = rle.decode_wire_indexed_numpy(wire, ts)
    n_words = wire[3 : 3 + T]
    table = wire[3 + T : 3 + T + rle.PAL_CAP]
    packed32 = wire[3 + T + rle.PAL_CAP :]
    pos = 0
    for t in range(T):
        n = int(n_words[t])
        native = rle_decode_words(packed32, pos, n, table, ts, ts)
        np.testing.assert_array_equal(native, tiles[t])
        np.testing.assert_array_equal(native, rgb[t])
        pos += n


def test_indexed_wire_overflow_detected():
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)  # noise
    table = _palette_from_rgb(_random_tiles(rng, T=1))
    wire = np.asarray(
        rle.encode_wire_indexed_device(
            np.asarray(_planar_from_rgb(rgb)), 1024, np.asarray(table)
        )
    )
    assert int(wire[1]) > 1024  # total_words exceeds the cap
    assert rle.decode_wire_indexed_numpy(wire, 64) is None


def test_renderer_v1_then_v2_serving_equality():
    """The renderer learns the palette from the first (v1) fetch and
    ships subsequent batches on the indexed wire; both must decode to
    the raw planar bytes, and overflow must fall back."""
    import jax.numpy as jnp

    from osm_renderer_tpu.mapcss.parser import parse_string
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer
    from osm_renderer_tpu.ops.render_pallas import planar_to_rgb
    from tests.fixtures import build_mini_reader
    from osm_renderer_tpu.core.tile import Tile, coords_to_max_zoom_tile
    import tempfile

    reader = build_mini_reader(tempfile.mkdtemp())
    styler = Styler(
        parse_string(
            """
            canvas { fill-color: #f1eee8; }
            way[building] { fill-color: #d9d0c9; z-index: 5; }
            way[highway] { color: #ffffff; width: 3; }
            area[natural=water] { fill-color: #b5d0d0; }
            """
        ),
        "josm",
    )
    t18 = coords_to_max_zoom_tile(47.1412, 9.5215)
    tiles = [Tile(16, (t18.x >> 2) + dx, t18.y >> 2) for dx in range(2)]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    dev = BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=16,
        indexed_wire=True,
    )
    prep = dev.prepare(te, 1)
    res1 = dev.render_prepared_rle(prep)
    assert res1.fmt == "v1"
    rgb1 = dev.fetch_rgb_rle(res1)
    ref = planar_to_rgb(np.asarray(res1.planar))
    np.testing.assert_array_equal(rgb1, ref)
    assert dev._pal_dev is not None  # palette learned
    res2 = dev.render_prepared_rle(dev.prepare(te, 1))
    assert res2.fmt == "v2"
    rgb2 = dev.fetch_rgb_rle(res2)
    np.testing.assert_array_equal(rgb2, ref)
    # Forced tiny word cap -> overflow -> raw planar fallback, still exact.
    wcap0 = dev._pick_wtot(res2.ts, len(te))
    dev._wtot_by_key[(res2.ts, len(te))] = 256
    res3 = dev.render_prepared_rle(dev.prepare(te, 1))
    rgb3 = dev.fetch_rgb_rle(res3)
    np.testing.assert_array_equal(rgb3, ref)
    assert dev._wtot_by_key[(res3.ts, len(te))] > 256  # cap regrew


@pytest.mark.tpu_hw
def test_pallas_emit_wire_matches_xla():
    """The Pallas RLE emit kernel must produce bit-identical wire bytes
    to the XLA gather-based encoder (live payload + header; overflow
    payloads are garbage on both sides, headers must still agree)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("Pallas emit kernel needs a real TPU")
    import jax.numpy as jnp
    from osm_renderer_tpu.ops import rle_pallas

    rng = np.random.default_rng(3)
    rgb = _random_tiles(rng, T=4, ts=256)
    p = _planar_from_rgb(rgb)
    pd = jnp.asarray(p)
    ref = np.asarray(rle.encode_wire_device(pd, 65536))
    got = np.asarray(rle_pallas.encode_wire_pallas_device(pd, 65536))
    np.testing.assert_array_equal(ref, got)
    # overflow: headers (tile counts + totals) must agree
    ref_o = np.asarray(rle.encode_wire_device(pd, 1024))
    got_o = np.asarray(rle_pallas.encode_wire_pallas_device(pd, 1024))
    T = int(ref_o[0])
    np.testing.assert_array_equal(ref_o[: 2 + T], got_o[: 2 + T])


@pytest.mark.tpu_hw
def test_pallas_indexed_wire_matches_xla():
    """The Pallas indexed-wire (v2) expand kernel must produce
    bit-identical wire bytes to the XLA encoder in non-overflow batches
    (palette hits AND literal escapes), and agree on [T, total_runs]
    plus the overflow signal (total_words > wcap) when the batch
    overflows."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("Pallas emit kernels need a real TPU")
    import jax.numpy as jnp
    from osm_renderer_tpu.ops import rle_pallas

    rng = np.random.default_rng(11)
    rgb = _random_tiles(rng, T=4, ts=256)
    p = _planar_from_rgb(rgb)
    pd = jnp.asarray(p)
    v = ((p[:, 0].astype(np.int64) << 16) | (p[:, 1].astype(np.int64) << 8)
         | p[:, 2].astype(np.int64)).reshape(-1)
    colors, counts = np.unique(v, return_counts=True)
    # Palette from only half the colors so BOTH word forms occur
    # (palette hits and 3-word literal escapes).
    keep = max(1, len(colors) // 2)
    tab = jnp.asarray(rle.build_palette(colors[:keep], counts[:keep]))
    # 65536 keeps the XLA reference encoder's compile time sane on the
    # tunnel (its searchsorted graph compiles ~linearly in wcap).
    wcap = 65536
    ref = np.asarray(rle.encode_wire_indexed_device(pd, wcap, tab))
    got = np.asarray(
        rle_pallas.encode_wire_indexed_pallas_device(pd, wcap, tab)
    )
    np.testing.assert_array_equal(ref, got)
    assert int(ref[1]) > int(ref[2])  # literal escapes exercised

    # All-literal: an empty-ish palette forces 3-word escapes everywhere.
    tab_miss = jnp.asarray(
        np.full(rle.PAL_CAP, rle.PAL_PAD, np.int32)
    )
    ref_l = np.asarray(rle.encode_wire_indexed_device(pd, wcap, tab_miss))
    got_l = np.asarray(
        rle_pallas.encode_wire_indexed_pallas_device(pd, wcap, tab_miss)
    )
    np.testing.assert_array_equal(ref_l, got_l)

    # Overflow: both sides must flag it; [T, total_runs] agree.
    wee = 1024
    ref_o = np.asarray(rle.encode_wire_indexed_device(pd, wee, tab))
    got_o = np.asarray(
        rle_pallas.encode_wire_indexed_pallas_device(pd, wee, tab)
    )
    assert int(ref_o[0]) == int(got_o[0])
    assert int(ref_o[2]) == int(got_o[2])
    assert int(ref_o[1]) > wee and int(got_o[1]) > wee


def test_png8_from_words_lossless():
    """words_to_png_pal emits a palette PNG whose decoded pixels equal
    the RGB-path decode exactly (PLTE = wire palette + literal
    extension), and falls back to None when the tile's colors exceed
    256 (the RGB path then serves it)."""
    PIL = pytest.importorskip("PIL.Image")
    from osm_renderer_tpu.draw.png_writer import (
        rle_decode_words,
        words_to_png_pal,
    )
    from osm_renderer_tpu.draw.png_writer import _get_native

    if _get_native() is None:
        pytest.skip("native pngenc unavailable")

    rng = np.random.default_rng(11)
    # Small palette image with a few literal (off-palette) colors.
    table = (rng.integers(0, 2**24, rle.PAL_CAP)).astype(np.int64)
    h = w = 64

    def build_words(colors):
        words = []
        pos = 0
        k = 0
        while pos < h * w:
            ln = min(int(rng.integers(1, 256)), h * w - pos)
            c = colors[k % len(colors)]
            k += 1
            if c[0] == "pal":
                words.append((c[1] << 8) | (ln - 1))
            else:
                v = c[1]
                words.append((0xFF << 8) | (ln - 1))
                words.append(v & 0xFFFF)
                words.append((v >> 16) & 0xFF)
            pos += ln
        if len(words) % 2:
            words.append(0)
        w16 = np.asarray(words, np.int64)
        return ((w16[0::2] & 0xFFFF) | (w16[1::2] << 16)).astype(np.int32), len(words) - (len(words) % 2 == 0 and 0 or 1)

    colors = [("pal", 3), ("pal", 77), ("lit", 0x123456), ("pal", 200),
              ("lit", 0xABCDEF)]
    packed32, _ = build_words(colors)
    # recount true words
    n_words = 0
    pos = 0
    w16 = np.empty(2 * packed32.shape[0], np.int64)
    w16[0::2] = packed32 & 0xFFFF
    w16[1::2] = (packed32.astype(np.int64) >> 16) & 0xFFFF
    i = 0
    while pos < h * w:
        hdr = int(w16[i])
        if (hdr >> 8) == 0xFF:
            i += 3
        else:
            i += 1
        pos += (hdr & 0xFF) + 1
    n_words = i

    ref = rle_decode_words(packed32, 0, n_words, table, h, w)
    png = words_to_png_pal(packed32, 0, n_words, table, h, w, 6)
    assert png is not None
    import io

    got = np.asarray(PIL.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(got, ref)

    # >256 distinct colors via literals: the palette path must decline.
    many = [("lit", int(v)) for v in rng.choice(2**24, 400, replace=False)]
    packed32b, _ = build_words(many)
    pos = i = 0
    w16 = np.empty(2 * packed32b.shape[0], np.int64)
    w16[0::2] = packed32b & 0xFFFF
    w16[1::2] = (packed32b.astype(np.int64) >> 16) & 0xFFFF
    while pos < h * w:
        hdr = int(w16[i])
        if (hdr >> 8) == 0xFF:
            i += 3
        else:
            i += 1
        pos += (hdr & 0xFF) + 1
    # 400 distinct literals over 64x64 at runs >= 1: may or may not
    # overflow depending on how many runs fit; force single-pixel runs.
    words = []
    for p in range(h * w):
        v = int(rng.integers(0, 2**24))
        words.append((0xFF << 8) | 0)
        words.append(v & 0xFFFF)
        words.append((v >> 16) & 0xFF)
    if len(words) % 2:
        words.append(0)
    w16 = np.asarray(words, np.int64)
    packed32c = ((w16[0::2] & 0xFFFF) | (w16[1::2] << 16)).astype(np.int32)
    assert words_to_png_pal(packed32c, 0, 3 * h * w, table, h, w, 6) is None
