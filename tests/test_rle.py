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
