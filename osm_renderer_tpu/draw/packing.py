"""Primitive packing: merge small same-style primitives into shared chunks.

A z15 city tile has hundreds of 4-edge buildings and dozens of
same-class road strokes; giving each its own 128-slot chunk leaves the
kernel >90% idle.  Primitives may share a chunk (= one "generation":
per-pixel max-alpha, then one src-over blend) when that cannot change
the output:

* identical style payload (kind, color, opacity, and for strokes the
  half-width/dash/cap parameters), and
* pairwise disjoint bounding boxes (inflated by the stroke margin), so
  no pixel is touched by two members — max-within vs. src-over-between
  is then indistinguishable, and fill span pairing cannot mix contours.

Within a maximal same-style run of the paint order, members may be
reordered (disjoint primitives' blends commute; overlapping ones stay
in separate chunks and keep their relative order).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from osm_renderer_tpu.draw.primitives import FillPrim, StrokePrim


def _style_key(p):
    if isinstance(p, FillPrim):
        return ("fill", p.color, p.opacity, p.fill_image)
    return (
        "stroke", p.color, p.opacity, p.half_width, p.dashes, p.cap,
        p.use_caps_for_dashes,
    )


def _bbox(p) -> Optional[Tuple[int, int, int, int]]:
    if isinstance(p, FillPrim):
        g = p.edges
        margin = 0
    else:
        g = p.segs
        margin = int(np.ceil(p.half_width)) + 2
    if g.shape[0] == 0:
        return None
    xs = g[:, [0, 2]]
    ys = g[:, [1, 3]]
    return (
        int(xs.min()) - margin,
        int(xs.max()) + margin,
        int(ys.min()) - margin,
        int(ys.max()) + margin,
    )


def _disjoint(a, b) -> bool:
    return a[1] < b[0] or b[1] < a[0] or a[3] < b[2] or b[3] < a[2]


def _geom_count(p) -> int:
    return p.edges.shape[0] if isinstance(p, FillPrim) else p.segs.shape[0]


def _is_closed_loops(p) -> bool:
    """True if a fill's edges form a union of closed loops (every vertex
    balanced as start and end) — required for cross-contour span pairing
    to stay correct when merging; open contours are never packed.

    Edges come chained (consecutive point pairs per ring), so it
    suffices to check that every chained run closes back on its start.
    """
    if not isinstance(p, FillPrim):
        return True
    g = p.edges
    n = g.shape[0]
    if n == 0:
        return False
    cont = np.all(g[:-1, 2:] == g[1:, :2], axis=1) if n > 1 else np.zeros(0, bool)
    ring_starts = np.concatenate(([0], np.flatnonzero(~cont) + 1))
    ring_ends = np.concatenate((ring_starts[1:] - 1, [n - 1]))
    return bool(np.all(g[ring_starts, :2] == g[ring_ends, 2:]))


class _Pack:
    __slots__ = ("prims", "bboxes", "count")

    def __init__(self):
        self.prims = []
        self.bboxes = []
        self.count = 0

    def fits(self, p, bb, capacity: int) -> bool:
        if self.count + _geom_count(p) > capacity:
            return False
        return all(_disjoint(bb, other) for other in self.bboxes)

    def add(self, p, bb) -> None:
        self.prims.append(p)
        self.bboxes.append(bb)
        self.count += _geom_count(p)


def pack_prims(prims: List[object], capacity: int) -> List[List[object]]:
    """Paint-ordered primitives -> list of chunk groups (lists of prims).

    Oversize primitives (> capacity geometry) are returned as singleton
    groups and handled by the caller's chunk splitting.
    """
    groups: List[List[object]] = []
    i = 0
    n = len(prims)
    while i < n:
        key = _style_key(prims[i])
        j = i
        run = []
        while j < n and _style_key(prims[j]) == key:
            run.append(prims[j])
            j += 1

        packable = [
            p for p in run
            if _geom_count(p) <= capacity
            and _is_closed_loops(p)
            and getattr(p, "fill_image", None) is None
        ]
        packable_ids = {id(p) for p in packable}
        big = [p for p in run if id(p) not in packable_ids]
        small = packable

        # Compute bboxes once; spatial sort improves row-block locality.
        with_bb = [(p, _bbox(p)) for p in small]
        with_bb = [(p, bb) for p, bb in with_bb if bb is not None]
        with_bb.sort(key=lambda pb: (pb[1][2] // 64, pb[1][0]))

        packs: List[_Pack] = []
        for p, bb in with_bb:
            placed = False
            for pack in packs:
                if pack.fits(p, bb, capacity):
                    pack.add(p, bb)
                    placed = True
                    break
            if not placed:
                pack = _Pack()
                pack.add(p, bb)
                packs.append(pack)

        for pack in packs:
            groups.append(pack.prims)
        for p in big:
            groups.append([p])
        i = j
    return groups
