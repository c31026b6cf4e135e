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

from osm_renderer_tpu.draw.primitives import FAST_COORD_BOUND, FillPrim, StrokePrim


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


def _precompute_pack_attrs(prims: List[object]):
    """Vectorized `_bbox` + `_is_closed_loops` over the whole prim list.

    One concatenate + `reduceat` sweep replaces per-prim numpy reductions
    (which dominate host assembly time on dense tiles).  Results match
    the scalar helpers exactly; those remain as the executable spec."""
    n = len(prims)
    is_fill = np.fromiter((isinstance(p, FillPrim) for p in prims), bool, n)
    geoms = [(p.edges if isinstance(p, FillPrim) else p.segs) for p in prims]
    lens = np.fromiter((g.shape[0] for g in geoms), np.int64, n)
    total = int(lens.sum())
    bboxes: List[Optional[Tuple[int, int, int, int]]] = [None] * n
    closed = np.where(is_fill, False, True)
    if total == 0:
        return lens, bboxes, closed

    margins = np.fromiter(
        (
            0 if isinstance(p, FillPrim) else int(np.ceil(p.half_width)) + 2
            for p in prims
        ),
        np.int64,
        n,
    )
    allg = np.concatenate([g for g in geoms if g.shape[0]], axis=0)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    nz = lens > 0
    starts_nz = offs[:-1][nz]

    xlo = np.minimum(allg[:, 0], allg[:, 2])
    xhi = np.maximum(allg[:, 0], allg[:, 2])
    ylo = np.minimum(allg[:, 1], allg[:, 3])
    yhi = np.maximum(allg[:, 1], allg[:, 3])
    m_nz = margins[nz]
    box_arr = np.stack(
        [
            np.minimum.reduceat(xlo, starts_nz) - m_nz,
            np.maximum.reduceat(xhi, starts_nz) + m_nz,
            np.minimum.reduceat(ylo, starts_nz) - m_nz,
            np.maximum.reduceat(yhi, starts_nz) + m_nz,
        ],
        axis=1,
    ).tolist()
    for k, i in enumerate(np.flatnonzero(nz)):
        bboxes[i] = tuple(box_arr[k])

    # Closed-loop check: chain continuity broken at prim boundaries, then
    # every chained run must close back on its start.
    N = allg.shape[0]
    cont = (
        np.all(allg[:-1, 2:] == allg[1:, :2], axis=1)
        if N > 1
        else np.zeros(0, bool)
    )
    b = offs[1:-1]
    b = b[(b >= 1) & (b <= N - 1)]
    cont[b - 1] = False
    ring_starts = np.concatenate(([0], np.flatnonzero(~cont) + 1))
    ring_ends = np.concatenate((ring_starts[1:] - 1, [N - 1]))
    ring_closed = np.all(allg[ring_starts, :2] == allg[ring_ends, 2:], axis=1)
    prim_of_ring = np.searchsorted(offs[1:], ring_starts, side="right")
    all_rings_closed = np.ones(n, bool)
    np.logical_and.at(all_rings_closed, prim_of_ring, ring_closed)
    closed = np.where(is_fill, all_rings_closed & nz, True)
    return lens, bboxes, closed


class _Pack:
    __slots__ = ("prims", "bboxes", "count")

    def __init__(self):
        self.prims = []
        self.bboxes = []
        self.count = 0

    def fits(self, cnt: int, bb, capacity: int) -> bool:
        if self.count + cnt > capacity:
            return False
        return all(_disjoint(bb, other) for other in self.bboxes)

    def add(self, p, cnt: int, bb) -> None:
        self.prims.append(p)
        self.bboxes.append(bb)
        self.count += cnt


def pack_prims(prims: List[object], capacity: int) -> List[List[object]]:
    """Paint-ordered primitives -> list of chunk groups (lists of prims).

    Oversize primitives (> capacity geometry) are returned as singleton
    groups and handled by the caller's chunk splitting.
    """
    lens, bboxes, closed = _precompute_pack_attrs(prims)
    # Prims with coordinates beyond the int32-safe bound are flagged for
    # the host-layer path (stream_tile_packed) and never packed.
    for k, bb in enumerate(bboxes):
        if bb is not None and (
            max(abs(bb[0]), abs(bb[1]), abs(bb[2]), abs(bb[3])) >= FAST_COORD_BOUND
        ):
            prims[k]._coord_oob = True
    groups: List[List[object]] = []
    i = 0
    n = len(prims)
    while i < n:
        key = _style_key(prims[i])
        j = i
        while j < n and _style_key(prims[j]) == key:
            j += 1

        small = []
        big = []
        for k in range(i, j):
            if (
                lens[k] <= capacity
                and closed[k]
                and getattr(prims[k], "fill_image", None) is None
                and not getattr(prims[k], "_coord_oob", False)
            ):
                small.append(k)
            else:
                big.append(k)

        # Spatial sort improves row-block locality.
        with_bb = [k for k in small if bboxes[k] is not None]
        with_bb.sort(key=lambda k: (bboxes[k][2] // 64, bboxes[k][0]))

        # A pack that cannot fit the run's smallest prim can never
        # accept again — retire it from the first-fit scan (identical
        # packing, fewer candidate packs per prim).
        min_cnt = int(min((lens[k] for k in with_bb), default=0))
        full_packs: List[_Pack] = []
        packs: List[_Pack] = []
        for k in with_bb:
            bb = bboxes[k]
            cnt = int(lens[k])
            placed = False
            for pi, pack in enumerate(packs):
                if pack.fits(cnt, bb, capacity):
                    pack.add(prims[k], cnt, bb)
                    if pack.count + min_cnt > capacity:
                        full_packs.append(packs.pop(pi))
                    placed = True
                    break
            if not placed:
                pack = _Pack()
                pack.add(prims[k], cnt, bb)
                if pack.count + min_cnt > capacity:
                    full_packs.append(pack)
                else:
                    packs.append(pack)

        for pack in full_packs:
            groups.append(pack.prims)
        for pack in packs:
            groups.append(pack.prims)
        for k in big:
            groups.append([prims[k]])
        i = j
    return groups
