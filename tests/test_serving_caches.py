"""Serving-cache lifecycle regressions (code-review round 2).

1. A mid-batch pattern-table overflow must not leave cache entries
   built against the discarded tables (their profile/pattern indices
   would dereference the wrong rows next batch).
2. Dashed strokes whose raw polyline reaches beyond the int32-safe
   bound route to the exact host-layer path even when the view cull
   leaves only small-coordinate segments (f32 `traveled` would lose
   dash-phase exactness).
"""

import numpy as np
import pytest

from osm_renderer_tpu.draw.packing import pack_prims
from osm_renderer_tpu.draw.primitives import (
    FAST_COORD_BOUND,
    make_stroke_prim,
)
from osm_renderer_tpu.ops.coverage_np import LINE_CAP_BUTT


def test_pattern_overflow_stops_caching(tmp_path, monkeypatch):
    from PIL import Image

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.mapcss.parser import parse_string
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer
    from tests.fixtures import build_mini_reader

    reader = build_mini_reader(tmp_path)

    (tmp_path / "icons").mkdir()
    rng = np.random.default_rng(1)
    for name in ("a", "b", "c"):
        px = rng.integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
        Image.fromarray(px, "RGBA").save(tmp_path / "icons" / f"{name}.png")

    style = """
canvas { fill-color: #f1eee8; }
way[building] { fill-image: "icons/a.png"; }
area[natural=water], way[natural=water] { fill-image: "icons/b.png"; }
way[highway=residential] { color: #ffffff; width: 3; }
"""
    styler = Styler(parse_string(style), "josm")
    dev = BatchRenderer(
        styler,
        backend="pallas",
        interpret=True,
        stylesheet_dir=str(tmp_path),
        chunk_cache_tiles=64,
    )
    # Force an overflow as soon as any pattern registers.
    monkeypatch.setattr(BatchRenderer, "MAX_PERSISTED_PATTERNS", 0)

    zt = sorted(set(zip((reader.tiles["x"] >> 2).tolist(), (reader.tiles["y"] >> 2).tolist())))
    tiles = [Tile(16, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    prep = dev.prepare(te, scale=1)
    # At least one tile registered a pattern, so the (0-capacity)
    # persisted table overflowed mid-batch; nothing may remain cached
    # (entries would carry indices into the discarded tables).
    assert np.asarray(prep.batch.pat).max() >= 0, "fixture lost its icon fills"
    assert len(dev._chunk_cache) == 0
    assert not dev._persist_tables
    # The batch itself stays internally consistent: every pattern index
    # points into the shipped pattern array.
    pat = np.asarray(prep.batch.pat)
    n_pat = np.asarray(prep.batch.patterns).shape[0]
    assert pat.max() < n_pat
    # A fresh prepare (new tables) is also consistent.
    prep2 = dev.prepare(te, scale=1)
    pat2 = np.asarray(prep2.batch.pat)
    assert pat2.max() < np.asarray(prep2.batch.patterns).shape[0]


def test_far_reaching_dashed_routes_to_exact_path():
    # The polyline accumulates > 60k px of arc length far outside the
    # canvas (beyond the int32-safe bound), then drops into view with
    # small coordinates; f32 arc length at that magnitude cannot hold
    # dash phases, so the prim must still route to the host-layer path
    # even though every KEPT segment is small-coordinate.
    far = FAST_COORD_BOUND + 50_000
    pairs = np.array(
        [[-far, -5000, 30, -5000], [30, -5000, 30, 40], [30, 40, 90, 40]],
        dtype=np.int64,
    )
    p = make_stroke_prim(
        pairs, 2.0, (0, 0, 0), 1.0, [6.0, 3.0], LINE_CAP_BUTT, True, view_px=256
    )
    # The cull keeps only in-view rows with small coordinates...
    assert p.segs.shape[0] >= 1
    assert int(np.abs(p.segs).max()) < FAST_COORD_BOUND
    # ...but packing must still route the prim to the host-layer path.
    pack_prims([p], 128)
    assert getattr(p, "_coord_oob", False)

    # A solid stroke with the same shape stays on the fast path (its
    # painted output depends only on the kept segments).
    q = make_stroke_prim(
        pairs, 2.0, (0, 0, 0), 1.0, None, LINE_CAP_BUTT, True, view_px=256
    )
    pack_prims([q], 128)
    assert not getattr(q, "_coord_oob", False)
