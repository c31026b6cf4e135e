"""Device label slab (parallel/label_slab.py): quantized committed
label layers blitted over the planar render on device.

Parity contract: unlabeled pixels (identity rows / outside the layer
bbox) are byte-identical to the unlabeled render; labeled pixels are
within 1 u8 step of the host composite (labeler.composite_labels —
the round-4 serving path), with alpha==1 label cores byte-identical.
This is inside the documented <= 1/255 label deviation (PARITY.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from osm_renderer_tpu.parallel.label_slab import (
    IDENTITY_A16P,
    LabelSlab,
    blit_planar,
    quantize_compact,
)


def _host_composite(base_rgb: np.ndarray, compact) -> np.ndarray:
    """The exact host expression from labeler.composite_labels."""
    y0, y1, x0, x1, rgb255, alpha = compact
    out = base_rgb.copy()
    sub = rgb255 + (1.0 - alpha) * base_rgb[y0:y1, x0:x1].astype(np.float64)
    out[y0:y1, x0:x1] = np.clip(np.trunc(sub + 1e-9), 0, 255).astype(np.uint8)
    return out


def _random_compact(rng, ts: int):
    y0, x0 = rng.integers(0, ts - 16, 2)
    h, w = rng.integers(4, 16, 2)
    y1, x1 = min(ts, y0 + h), min(ts, x0 + w)
    alpha = rng.random((y1 - y0, x1 - x0, 1))
    # Mix in exact 0s and 1s (transparent holes / opaque cores).
    alpha[rng.random(alpha.shape) < 0.25] = 0.0
    alpha[rng.random(alpha.shape) < 0.25] = 1.0
    color = rng.integers(0, 256, 3).astype(np.float64)
    rgb255 = alpha * color  # premultiplied
    return (int(y0), int(y1), int(x0), int(x1), rgb255, alpha)


def test_blit_matches_host_composite():
    ts = 64
    rng = np.random.default_rng(7)
    slab = LabelSlab(ts, min_cap=8)
    compacts = [_random_compact(rng, ts) for _ in range(5)]
    keys = [("t", i) for i in range(5)]
    slab.insert(list(zip(keys, compacts)))

    base = rng.integers(0, 256, (5, 4, ts, ts)).astype(np.uint8)
    lrow = slab.lrow(5, list(enumerate(keys)))
    out = np.asarray(blit_planar(jnp.asarray(base), slab.plane, jnp.asarray(lrow)))

    for i, compact in enumerate(compacts):
        base_rgb = np.ascontiguousarray(base[i, :3].transpose(1, 2, 0))
        want = _host_composite(base_rgb, compact)
        got = np.ascontiguousarray(out[i, :3].transpose(1, 2, 0))
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 1, (i, diff.max())
        # Outside the layer bbox: byte-identical passthrough.
        y0, y1, x0, x1 = compact[:4]
        mask = np.ones((ts, ts), bool)
        mask[y0:y1, x0:x1] = False
        assert np.array_equal(want[mask], got[mask])
        # Opaque label cores: byte-identical.
        a = compact[5][..., 0]
        core = a >= 1.0
        assert np.array_equal(
            want[y0:y1, x0:x1][core], got[y0:y1, x0:x1][core]
        )
        # Alpha plane untouched.
        assert np.array_equal(out[i, 3], base[i, 3])


def test_identity_row_is_exact_passthrough():
    ts = 32
    rng = np.random.default_rng(3)
    slab = LabelSlab(ts, min_cap=8)
    base = rng.integers(0, 256, (2, 4, ts, ts)).astype(np.uint8)
    slab._grow(4)  # materialize the plane without any insert
    lrow = np.zeros((2, ts), np.int32)
    out = np.asarray(blit_planar(jnp.asarray(base), slab.plane, jnp.asarray(lrow)))
    assert np.array_equal(out, base)


def test_quantize_identity_outside_bbox_columns():
    ts = 16
    compact = (2, 5, 4, 9, np.full((3, 5, 3), 100.0), np.full((3, 5, 1), 0.5))
    rows, y0 = quantize_compact(compact, ts)
    assert y0 == 2 and rows.shape == (3, 2, ts)
    assert (rows[:, 0, :4] == 0).all() and (rows[:, 0, 9:] == 0).all()
    assert (rows[:, 1, :4] == IDENTITY_A16P).all()
    assert (rows[:, 1, 9:] == IDENTITY_A16P).all()


def test_slab_lru_eviction_and_free_list():
    ts = 32
    rng = np.random.default_rng(11)
    slab = LabelSlab(ts, min_cap=8, max_tiles=3)
    for i in range(6):
        slab.insert([((i,), _random_compact(rng, ts))])
    # max_tiles=3: oldest keys evicted, their rows returned to the
    # free list / coalesced.
    assert len(slab._offsets) <= 3
    assert (5,) in slab and (0,) not in slab
    # Re-inserting an evicted key re-allocates (possibly reusing freed
    # rows) and blits correctly.
    c0 = _random_compact(rng, ts)
    slab.insert([((0,), c0)])
    assert (0,) in slab
    base = rng.integers(0, 256, (1, 4, ts, ts)).astype(np.uint8)
    lrow = slab.lrow(1, [(0, (0,))])
    out = np.asarray(blit_planar(jnp.asarray(base), slab.plane, jnp.asarray(lrow)))
    want = _host_composite(
        np.ascontiguousarray(base[0, :3].transpose(1, 2, 0)), c0
    )
    got = np.ascontiguousarray(out[0, :3].transpose(1, 2, 0))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_slab_clear_bumps_generation():
    slab = LabelSlab(32, min_cap=8)
    g = slab.generation
    slab.clear()
    assert slab.generation == g + 1


def test_pinned_batch_exhaustion_raises():
    ts = 32
    slab = LabelSlab(ts, min_cap=8)
    slab.MAX_CAP = 8  # tiny: one tall layer fills it
    tall = (0, 7, 0, ts, np.zeros((7, ts, 3)), np.ones((7, ts, 1)))
    slab.insert([(("a",), tall)])
    with pytest.raises(MemoryError):
        slab._alloc_evicting(8, pinned={("a",)})


@pytest.mark.slow
def test_arena_device_labels_match_host_composite(tmp_path):
    """Full arena render with label_layers vs unlabeled render + host
    composite_labels: unlabeled tiles byte-equal, labeled within 1."""
    import os

    from tests.fixtures import build_mini_reader
    from tests.conftest import REPO_ROOT
    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.draw.labels.labeler import Labeler
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    sd = os.path.join(REPO_ROOT, "assets", "stylesheets")
    reader = build_mini_reader(tmp_path)
    styler = Styler(parse_file(sd, "default.mapcss"), "josm")
    zt = sorted(
        set(zip((reader.tiles["x"] >> 3).tolist(), (reader.tiles["y"] >> 3).tolist()))
    )[:4]
    tiles = [Tile(15, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    labeler = Labeler(icon_base_path=sd, label_cache_tiles=64)
    compacts = [labeler.ensure_layer(e, t, 1.0, styler, 256) for e, t in te]
    assert any(c is not None for c in compacts), "fixture lost its labels"

    r = BatchRenderer(
        styler, backend="pallas", interpret=True, chunk_cache_tiles=16,
        arena=True,
    )
    base = np.asarray(r.render_prepared_planar(r.prepare(te, scale=1)))
    prep = r.prepare(te, scale=1, label_layers=compacts)
    assert set(prep.device_labeled) == {
        i for i, c in enumerate(compacts) if c is not None
    }
    dev = np.asarray(r.render_prepared_planar(prep))

    for i, (e, t) in enumerate(te):
        want = np.ascontiguousarray(base[i, :3].transpose(1, 2, 0))
        got = np.ascontiguousarray(dev[i, :3].transpose(1, 2, 0))
        if compacts[i] is None:
            assert np.array_equal(want, got)
            continue
        want = labeler.composite_labels(want, e, t, 1.0, styler)
        assert np.abs(want.astype(int) - got.astype(int)).max() <= 1
