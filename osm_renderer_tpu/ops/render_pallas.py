"""Pallas TPU rasterization kernel.

One `pallas_call` renders a whole batch of tiles: grid = (tiles,
chunks); the sequential TPU grid walks each tile's paint-ordered chunk
stream while the premultiplied RGBA accumulator lives in the output
block (VMEM-resident across the tile's chunks — no HBM round trips
between primitives, unlike a scan-based XLA program).  Per-chunk work
is restricted to the chunk's bounding-box row blocks (host-computed),
which is where the 10-100x win over dense evaluation comes from:
buildings touch ~2 row blocks, not 256 rows.

Fills ride the MXU: the host extracts the exact scanline spans the
reference's fill would paint (draw/spans.py — integer closed form of
fill.rs:16-104 incl. the poisoned-vertex rule), and the kernel paints
them with a coverage matmul per 32-row block:
    covered = (U @ W) > 0,  U[r,s] = (span s is on row r),
                            W[s,x] = (xlo_s <= x <= xhi_s)
with 0/1 bf16 operands and f32 accumulation (sums <= 128, exact), so
fill membership is byte-exact by construction.

Strokes use the closed-form coverage model validated against the C++
oracle (see ops/coverage_np.py): perpendicular-band ownership +
dash/cap/feather opacity.  All integer forms fit int32 under the
host-checked |coord| < 12000 bound; floats are f32 (<= 1/255 output
tolerance).

Data layout (host-built by `build_pallas_batch`):
  geometry   (C, 4, CH) int32  strokes: SoA point pairs;
             fills: rows (y, xlo, xhi, -) spans, lanes padded
             (y=-1, xlo=1, xhi=0) so pad lanes cover nothing
  traveled   (C, CH)    f32    arc length before each stroke segment
  seg_prof   (C, CH)    int32  dash profile index per segment
  profiles   (NP, DS, 8)   -> prefetched to SMEM as (NP*DS*8,) i32 bits
  scalars    (C,) int32 each: kind, cnt, last, y0, nb (row blocks),
             prim_y0, prim_nb (blend bbox), color r/g/b,
             opacity/halfwidth as f32 bit patterns
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 128          # geometry slots per chunk (= TPU lane width)
RB = 32           # rows per stroke processing block
RB_F = 32         # rows per fill/blend processing block
DS = 4            # dash-profile rows per profile
GROUP = 8         # chunks per grid step (tiles pad to a multiple of
                  # GROUP; at most one pattern index per step).  Device
                  # time (tools/kdevice.py, 97-tile z15 batch): 7.37 ms
                  # at GROUP=1 vs 6.8 ms at GROUP=8/32 — grouping
                  # amortizes the per-step index-map/sequencing cost
                  # ~8x; beyond 8 is flat while padding waste grows.

KIND_PAD = 0
KIND_FILL = 1
KIND_STROKE = 2
KIND_STROKE_SOLID = 3
KIND_STROKE_SOLID_WIDE = 4  # legacy (r2): no longer emitted — wide/thin
                            # routing is now per-segment via item sections
KIND_FILL_IMAGE = 5
KIND_LAYER = 6      # host-rasterized premultiplied layer (src-over of a pattern)
# Dashed strokes whose profiles have no round-cap originals: walk
# aliveness is purely geometric (identical to solid — the chain rule
# only exists because round caps shrink the half-width along the arc),
# so they ride the work-item path with the dash profile evaluated in
# the alpha.  Round-capped dashes keep the per-segment KIND_STROKE path.
KIND_STROKE_DASH = 7
KIND_STROKE_DASH_WIDE = 8   # legacy (r2): no longer emitted
# Solid strokes whose walk starts are all provably alive paint, per
# pixel row, a piecewise-LINEAR alpha in x (the feather is linear in
# the integer cross product, which is linear in x along a row; the
# slab/edge-band rules only clip the row interval).  The host
# rasterizes the exact per-pixel alpha once (kernel-identical f32
# formulas), pre-merges the generation's overlaps with fmax (max of
# linears is piecewise linear) and compresses each row into gradient
# spans (y, x0, x1, a0, da); the kernel paints a whole 128-span chunk
# with ONE f32 coverage matmul per 32-row block — painted-volume-bound
# (~1 span per ~12 painted px) instead of window-bound like the item
# path (DESIGN.md §5 round-5).  Dead-start segments keep the exact
# item path; cross-chunk overlap stays exact because pending is fmax.
KIND_STROKE_SPAN = 9

# Span tolerances.  SPAN_TOL bounds the first-stage linear-piece
# extraction (alpha domain); TOL255 bounds the final per-lane verify in
# the kernel's 255-scaled domain (every emitted lane is checked
# per-pixel against the rasterized truth with the exact f32 expression
# the kernel evaluates, so the served alpha error is <= TOL255/255 +
# 2^-9/255 from the bf16 int/frac matmul split — ~0.03 of a u8 step).
SPAN_TOL = np.float32(2.0 ** -15)
TOL255 = np.float32(2.0 ** -5)
# Row-range merge cap: identical consecutive rows (verticals) collapse
# into one lane covering up to this many rows (bounded so a chunk's
# row-block loop stays local).
SPAN_ROW_MERGE = 32

NSEC = 12         # item section slots per chunk: [0,4) shallow alive
                  # (8x128 windows; subsumes axis-aligned — mn = 0
                  # collapses the general formulas), [4,8) steep alive
                  # (16x64 windows, sub-half bit 14 in the item word),
                  # [8,12) segments with (possibly) dead walk starts
                  # (8x128, full dead-start machinery); within each
                  # family one slot per 128-column half


class PallasBatch(NamedTuple):
    """Flat chunk stream over all tiles; grid = (total chunks,).

    tile_id routes each chunk to its tile's output block; `first` marks
    a tile's first chunk (accumulator init)."""
    geom: np.ndarray        # (Ctot, 4, CH) int32
    traveled: np.ndarray    # (Ctot, 1, CH) f32
    seg_prof: np.ndarray    # (Ctot, 1, CH) int32
    seg_aux: np.ndarray     # (Ctot, 4, CH) f32: inv_denom, ratio, hK, spare
    tile_id: np.ndarray     # (Ctot,) int32
    first: np.ndarray       # (Ctot,) int32
    kind: np.ndarray        # (Ctot,) int32
    cnt: np.ndarray         # (Ctot,) int32
    last: np.ndarray        # (Ctot,) int32
    y0: np.ndarray          # (Ctot,) int32  first row block (in RB units)
    nb: np.ndarray          # (Ctot,) int32  number of row blocks
    prim_y0: np.ndarray     # (Ctot,) int32  blend bbox (in RB units, on last)
    prim_nb: np.ndarray     # (Ctot,) int32
    color: np.ndarray       # (Ctot, 3) f32
    opacity: np.ndarray     # (Ctot,) f32
    hw: np.ndarray          # (Ctot,) f32
    profiles: np.ndarray    # (NP, DS, 8) f32
    profile_total: np.ndarray  # (NP,) f32
    pat: np.ndarray         # (Ctot,) int32  pattern index (-1 = plain color)
    patterns: np.ndarray    # (NPat, 4, ts, ts) f32 premultiplied tiled icons
    items: np.ndarray       # (Ctot, 1, IT) i32 solid-stroke work items
    isec: np.ndarray        # (Ctot, NSEC) i32 cumulative item-section ends


def _f32_bits(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32).view(np.int32)


def _convert_tile_chunks(s, ts: int):
    """Per-tile chunk list with fill chunks converted to scanline-span
    chunks (draw/spans.py), split at CH spans.  Returns tuples
    (kind, geom(n,4), traveled, profile, last, color, opacity, hw, pat).

    Fill geometry columns become (y, x_from, x_to, 0); membership is
    decided on the host in exact integer arithmetic, the kernel only
    paints (fill.rs:16-47 semantics live in fill_spans)."""
    from osm_renderer_tpu.draw.spans import fill_spans

    out = []
    zero_f = np.zeros(0)
    zero_i = np.zeros(0, dtype=np.int64)
    for ci in range(len(s.chunk_kind)):
        k = s.chunk_kind[ci]
        g = s.geom[ci]
        meta = (s.chunk_color[ci], s.chunk_opacity[ci], s.chunk_hw[ci], s.chunk_pat[ci])
        if k in (KIND_FILL, KIND_FILL_IMAGE):
            if s.chunk_spans and s.chunk_spans[ci]:
                spans = g[:, :3].astype(np.int64)  # pre-extracted
            elif g.shape[0]:
                spans = fill_spans(g, ts).astype(np.int64)
            else:
                spans = np.zeros((0, 3), dtype=np.int64)
            S = spans.shape[0]
            last = s.chunk_last[ci]
            if S == 0:
                out.append((k, np.zeros((0, 4), np.int64), zero_f, zero_i, last) + meta)
                continue
            g4 = np.concatenate([spans, np.zeros((S, 1), np.int64)], axis=1)
            for off in range(0, S, CH):
                end = min(off + CH, S)
                nf = end - off
                out.append(
                    (k, g4[off:end], np.zeros(nf), np.zeros(nf, np.int64),
                     last and end == S) + meta
                )
        else:
            out.append((k, g, s.traveled[ci], s.profile[ci], s.chunk_last[ci]) + meta)
    return out


def next_bucket(n: int, minimum: int = 8) -> int:
    """Quarter-octave size buckets (p, 1.25p, 1.5p, 1.75p, 2p ...): at
    most 12.5% padding with a bounded set of jit signatures per octave
    (vs plain pow2's up-to-2x padding)."""
    v = max(n, minimum)
    p = 1 << max(v.bit_length() - 1, 3)
    if v == p:
        return v
    for num in (5, 6, 7, 8):
        b = (p * num) // 4
        if v <= b:
            return b
    return 2 * p


class TileChunks(NamedTuple):
    """One tile's device-ready chunk arrays.

    Independent of batch composition (chunk indices are tile-local and
    pattern/profile indices come from tables that persist across
    batches), so serving caches these per (tile, zoom, scale) and
    batches become pure concatenation (`concat_pallas_batch`)."""
    geom: np.ndarray      # (c, 4, CH) int32
    trav: np.ndarray      # (c, 1, CH) f32
    sprof: np.ndarray     # (c, 1, CH) int32
    aux: np.ndarray       # (c, 4, CH) f32
    kind: np.ndarray      # (c,) int32
    cnt: np.ndarray       # (c,) int32
    last: np.ndarray      # (c,) int32
    y0: np.ndarray        # (c,) int32
    nb: np.ndarray        # (c,) int32
    prim_y0: np.ndarray   # (c,) int32
    prim_nb: np.ndarray   # (c,) int32
    color: np.ndarray     # (c, 3) f32
    opacity: np.ndarray   # (c,) f32
    hw: np.ndarray        # (c,) f32
    pat: np.ndarray       # (c,) int32
    items: np.ndarray     # (c, 1, IT) i32 solid-stroke work items (-1 pad)
    isec: np.ndarray      # (c, NSEC) i32 cumulative item-section ends

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self)


RB_I = 8        # rows per shallow/dead stroke work-item window
RB16 = 16       # rows per steep (16, 64) work-item window
IT_CAP = 2048   # max work items per chunk (SMEM staging bound); chunks
                # exceeding it are split (same generation, last on tail)


def _seg_sub_blocks(gi: np.ndarray, m: int, ts: int, colw: int, rowb: int):
    """Per-(segment, column subrange of width `colw`) row-block ranges
    for work items, with `rowb`-row blocks.

    For each subrange the relevant segment portion is x in
    [c0 - m, c0 + colw - 1 + m]; the y-extent of that portion
    (diagonals only touch part of their global y-span inside one
    subrange) gives the block range, conservatively widened by one
    pixel to absorb the f64 interpolation rounding (the C++ assembler
    evaluates the bit-identical expression — native/assembler.cpp
    seg_sub_blocks).

    Returns (b0w, nblkw) int64 arrays of shape (n, ts // colw); a
    non-overlapping or degenerate (point) entry has nblkw == 0."""
    n = gi.shape[0]
    n_sub = ts // colw
    x1, y1, x2, y2 = gi[:, 0], gi[:, 1], gi[:, 2], gi[:, 3]
    nondeg = ~((x1 == x2) & (y1 == y2))
    xa = np.minimum(x1, x2)
    xb = np.maximum(x1, x2)
    ya = np.minimum(y1, y2)
    yb = np.maximum(y1, y2)
    vert = x1 == x2
    dx = x2 - x1
    dy = y2 - y1
    b0w = np.zeros((n, n_sub), dtype=np.int64)
    nblkw = np.zeros((n, n_sub), dtype=np.int64)
    for h in range(n_sub):
        c0 = h * colw
        lo = np.maximum(xa, c0 - m)
        hi = np.minimum(xb, c0 + colw - 1 + m)
        overlap = nondeg & (lo <= hi)
        # y at the clipped x endpoints (exact int64 products, one f64
        # division; +-1 guard absorbs its rounding).
        dxs = np.where(vert, 1, dx)
        y_lo = y1 + (lo - x1) * dy / dxs
        y_hi = y1 + (hi - x1) * dy / dxs
        sel_lo = np.floor(np.minimum(y_lo, y_hi)) - 1
        sel_hi = np.ceil(np.maximum(y_lo, y_hi)) + 1
        sel_lo = np.maximum(sel_lo, ya).astype(np.int64)
        sel_hi = np.minimum(sel_hi, yb).astype(np.int64)
        sel_lo = np.where(vert, ya, sel_lo)
        sel_hi = np.where(vert, yb, sel_hi)
        blo = np.clip(sel_lo - m, 0, ts - 1) // rowb
        bhi = np.clip(sel_hi + m, 0, ts - 1) // rowb
        b0w[:, h] = np.where(overlap, blo, 0)
        nblkw[:, h] = np.where(overlap, bhi - blo + 1, 0)
    return b0w, nblkw


def _seg_half_blocks(gi: np.ndarray, m: int, ts: int):
    """(8-row, 128-col) window ranges — see _seg_sub_blocks."""
    return _seg_sub_blocks(gi, m, ts, 128, RB_I)


def _stroke_item_counts(g: np.ndarray, c_hw: float, ts: int) -> np.ndarray:
    """Per-segment raw work-item count (before section padding),
    matching _stroke_items' window emission: steep alive segments get
    (16-row, 64-col) windows, everything else (8-row, 128-col)."""
    n = g.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    gi = g.astype(np.int64)
    m = int(np.ceil(c_hw)) + 1
    steep = np.abs(gi[:, 3] - gi[:, 1]) > np.abs(gi[:, 2] - gi[:, 0])
    alive = _seg_all_alive(g, c_hw)
    use16 = steep & alive
    _, nblk8 = _seg_sub_blocks(gi, m, ts, 128, RB_I)
    _, nblk16 = _seg_sub_blocks(gi, m, ts, 64, RB16)
    # Steep segments emit whichever shape is cheaper per half (see
    # _stroke_items); the per-seg min lower-bounds either choice, which
    # is what the IT_CAP chunk-split budget needs.
    s8 = nblk8.sum(axis=1)
    return np.where(use16, np.minimum(nblk16.sum(axis=1), s8), s8)


def _seg_alive_exact(x1, y1, x2, y2, mn, mx, den, ft) -> bool:
    """Exact dead-start scan for one segment: enumerate the gap-band
    owner starts (the staircase-skip positions `c(k)+1`; on-line starts
    have |cross| <= (mx-1)/2 so cd < 0.5 and are always alive) and test
    each against the feather cutoff.  Mirrors the kernel's invert()
    owner assignment: gap band in (h(k), h(k+1)) is owned by start
    (c(k)+1, k)."""
    k = np.arange(mx + 1, dtype=np.int64)
    c = (2 * k * mn + mx - 1) // (2 * mx)
    gk = (2 * c * mn + mx - 1) // (2 * mx)
    h = k + gk
    gap = (h[1:] - h[:-1]) == 2
    if not gap.any():
        return True
    ks = k[:-1][gap]
    cs = c[:-1][gap] + 1
    swap = abs(x2 - x1) > abs(y2 - y1)
    mn0 = y1 if swap else x1
    mx0 = x1 if swap else y1
    x_inc = 1 if x1 <= x2 else -1
    y_inc = 1 if y1 <= y2 else -1
    mn_i = y_inc if swap else x_inc
    mx_i = x_inc if swap else y_inc
    s_mn = mn0 + mn_i * cs
    s_mx = mx0 + mx_i * ks
    sx = s_mx if swap else s_mn
    sy = s_mn if swap else s_mx
    cross = (x2 * y1 - y2 * x1) + (y2 - y1) * sx - (x2 - x1) * sy
    cd = np.abs(cross).astype(np.float64) / den
    return bool((cd < ft).all())


def _seg_all_alive(g: np.ndarray, c_hw: float) -> np.ndarray:
    """Per-segment bool: True iff every perpendicular-walk owner start
    is provably alive (center distance < feather_to, with an epsilon
    guard), replicating the reference walk's aliveness rule
    (opacity_calculator.rs feather cutoff) in exact integer cross
    products + f64.  Alive segments ride the invert-free general-alive
    item path; anything uncertain routes to the exact general-dead
    path, so conservatism here costs speed, never parity."""
    n = g.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    if c_hw <= 0.0:
        # opacity_mul = min(2*hw, 1) == 0: the reference paints nothing;
        # the dead path's alive_at gate reproduces that exactly.
        return np.zeros(n, dtype=bool)
    ft = max(c_hw + 0.5, 1.0) - 1e-6
    gi = g.astype(np.int64)
    x1, y1, x2, y2 = gi[:, 0], gi[:, 1], gi[:, 2], gi[:, 3]
    dx = np.abs(x2 - x1)
    dy = np.abs(y2 - y1)
    mn = np.minimum(dx, dy)
    mx = np.maximum(np.maximum(dx, dy), 1)
    den = np.sqrt((dx * dx + dy * dy).astype(np.float64))
    # No gap bands at all (g(K) = 0, near-axis): on-line starts only.
    gK = (2 * mn * mn + mx - 1) // (2 * mx)
    alive = gK == 0
    # Worst-case gap-start cross is (3*mx - 1)/2 (on-line bound
    # (mx-1)/2 plus the one-step mn shift's mx): if even that is
    # inside the feather, every start is alive.
    alive |= (3 * mx - 1).astype(np.float64) < 2.0 * ft * den
    for i in np.flatnonzero(~alive & (den > 0)):
        alive[i] = _seg_alive_exact(
            int(x1[i]), int(y1[i]), int(x2[i]), int(y2[i]),
            int(mn[i]), int(mx[i]), float(den[i]), ft,
        )
    return alive


def _stroke_span_raster(g: np.ndarray, c_hw: float, c_op: float, ts: int):
    """Exact per-pixel alpha of a generation's alive solid segments,
    fmax-merged into one canvas.

    Every formula is the f32 expression the alive-mode item kernel
    evaluates (eval_group in make_render_kernel), so per-pixel values
    match the item path bit-for-bit: integer cross product -> f32
    feather -> alive-path visited rules (in_slab / edge-band ok_edge).
    Returns (acc (ts, ts) f32, ylo, yhi) with [ylo, yhi] the touched
    row range (ylo > yhi when nothing painted)."""
    acc = np.zeros((ts, ts), dtype=np.float32)
    row_lo, row_hi = ts, -1
    hwf = np.float32(c_hw)
    opf = np.float32(c_op)
    feather_from = np.maximum(hwf - np.float32(0.5), np.float32(0.0))
    feather_to = np.maximum(hwf + np.float32(0.5), np.float32(1.0))
    om = np.minimum(np.float32(2.0) * hwf, np.float32(1.0))
    dfe = feather_to - feather_from
    m = int(np.ceil(c_hw)) + 2
    gi = g.astype(np.int64)
    for s in range(gi.shape[0]):
        x1, y1, x2, y2 = (int(v) for v in gi[s])
        if x1 == x2 and y1 == y2:
            continue  # degenerate: the walk paints nothing
        dx = abs(x2 - x1)
        dy = abs(y2 - y1)
        mn = min(dx, dy)
        mx = max(dx, dy, 1)
        den = np.sqrt(np.float32(dx * dx + dy * dy))
        inv = np.float32(1.0) / np.maximum(den, np.float32(1e-9))
        swap = dx > dy
        mn0, mx0 = (y1, x1) if swap else (x1, y1)
        x_inc = 1 if x1 <= x2 else -1
        y_inc = 1 if y1 <= y2 else -1
        mn_i, mx_i = (y_inc, x_inc) if swap else (x_inc, y_inc)
        nc = x2 * y1 - y2 * x1
        sdx = x2 - x1
        sdy = y2 - y1
        cK = (2 * mx * mn + mx - 1) // (2 * mx)
        gK = (2 * cK * mn + mx - 1) // (2 * mx)
        hK = mx + gK
        ylo = max(min(y1, y2) - m, 0)
        yhi = min(max(y1, y2) + m, ts - 1)
        xlo = max(min(x1, x2) - m, 0)
        xhi = min(max(x1, x2) + m, ts - 1)
        if ylo > yhi or xlo > xhi:
            continue
        ys = np.arange(ylo, yhi + 1, dtype=np.int64)[:, None]
        xs = np.arange(xlo, xhi + 1, dtype=np.int64)[None, :]
        raw = nc + sdy * xs - sdx * ys
        cd = np.abs(raw).astype(np.float32) * inv
        vr = np.where(
            cd < feather_from,
            np.float32(1.0),
            np.where(cd < feather_to, (feather_to - cd) / dfe, np.float32(0.0)),
        )
        op = om * vr
        in_line = op > np.float32(0.0)
        MN = ys if swap else xs
        MX = xs if swap else ys
        n0 = (MN - mn0) * mn_i
        m0 = (MX - mx0) * mx_i
        A = 2 * mn * n0 + 2 * mx * m0 + (mx - 1)
        T = A // (2 * mx)  # int64 floor division (A may be negative)
        edge = (A - T * (2 * mx)) == (2 * mx - 1)
        in_slab = (A >= 0) & (T <= hK)
        ok_edge = (
            (in_slab & (T < hK))
            | ((T == hK) & (n0 >= mn))
            | ((A == -1) & (n0 <= 0))
        )
        visited = in_line & np.where(edge, ok_edge, in_slab)
        v = np.where(visited, opf * op, np.float32(0.0))
        np.maximum(acc[ylo : yhi + 1, xlo : xhi + 1], v,
                   out=acc[ylo : yhi + 1, xlo : xhi + 1])
        row_lo = min(row_lo, ylo)
        row_hi = max(row_hi, yhi)
    return acc, row_lo, row_hi


def _span_plat255(c_hw: float, c_op: float) -> np.float32:
    """The plateau value opacity * opacity_mul * 255 in the exact f32
    order the kernel computes it from its per-chunk scalars."""
    hwf = np.float32(c_hw)
    om = np.minimum(np.float32(2.0) * hwf, np.float32(1.0))
    return np.float32(np.float32(np.float32(c_op) * om) * np.float32(255.0))


def _tent_verify(vals255, x0: int, a: np.float32, b: np.float32,
                 xc: np.float32, plat255: np.float32) -> bool:
    """Per-pixel check of the kernel's f32 tent reconstruction
    max(min(a - b*|x - xc|, plat255), 0) against the rasterized truth
    (255-domain)."""
    xs = np.arange(x0, x0 + vals255.shape[0], dtype=np.int32).astype(np.float32)
    t = a - b * np.abs(xs - xc)
    t = np.maximum(np.minimum(t, plat255), np.float32(0.0))
    return bool((np.abs(t - vals255) <= TOL255).all())


def _emit_run_tents(y: int, x0: int, vals: np.ndarray,
                    plat255: np.float32, out: list) -> None:
    """One maximal nonzero run -> verified tent lanes.

    Stage 1 splits the run into greedy linear pieces (first-difference
    slope, SPAN_TOL in the alpha domain).  Stage 2 merges each
    [rising, plateau?, falling] piece group into ONE clipped tent
    (apex from the f64 intersection of the end lines) when the
    255-domain verify passes; every other piece emits as a one-sided
    tent (xc at the falling end), halved recursively in the (never
    observed) case its verify fails.  Deterministic scalar order —
    mirrored bit-for-bit by native/assembler.cpp."""
    L = vals.shape[0]
    vals255 = vals * np.float32(255.0)
    pieces = []  # (p0 rel, p1 rel, a0, da)
    i = 0
    while i < L:
        if i + 1 == L:
            pieces.append((i, i, vals[i], np.float32(0.0)))
            break
        da = vals[i + 1] - vals[i]
        j = i + 1
        while j + 1 < L:
            pred = vals[i] + da * np.float32(j + 1 - i)
            if abs(vals[j + 1] - pred) > SPAN_TOL:
                break
            j += 1
        pieces.append((i, j, vals[i], da))
        i = j + 1

    def emit_piece(p0: int, p1: int):
        # One-sided tent: a linear piece a0 + da*(x - p0) is the tent
        # a - b*|x - xc| with xc at the high-value end.
        a0 = vals[p0]
        if p1 == p0:
            cand = (np.float32(vals255[p0]), np.float32(0.0),
                    np.float32(x0 + p0))
        else:
            da = vals[p0 + 1] - vals[p0]
            if da <= np.float32(0.0):
                a = a0 * np.float32(255.0)
                b = (-da) * np.float32(255.0)
                xc = np.float32(x0 + p0)
            else:
                a = (a0 + da * np.float32(p1 - p0)) * np.float32(255.0)
                b = da * np.float32(255.0)
                xc = np.float32(x0 + p1)
            cand = (a, b, xc)
        if _tent_verify(vals255[p0 : p1 + 1], x0 + p0, *cand, plat255):
            out.append((y, x0 + p0, x0 + p1) + cand)
        else:  # split and retry (exact at 1 px by construction)
            mid = (p0 + p1) // 2
            emit_piece(p0, mid)
            emit_piece(mid + 1, p1)

    gi = 0
    while gi < len(pieces):
        p = pieces[gi]
        group_end = gi
        if p[3] > np.float32(0.0):
            k = gi + 1
            if k < len(pieces) and pieces[k][3] == np.float32(0.0):
                k += 1  # clipped plateau between the ramps
            if k < len(pieces) and pieces[k][3] < np.float32(0.0):
                group_end = k
        if group_end > gi:
            up = pieces[gi]
            dn = pieces[group_end]
            # Apex = intersection of the two end lines, in f64 (exact
            # enough; verified in f32 below).
            dau = float(up[3])
            dad = float(dn[3])
            xu = float(x0 + up[0])
            xd = float(x0 + dn[0])
            xstar = (float(dn[2]) - dad * xd - float(up[2]) + dau * xu) / (
                dau - dad
            )
            astar = float(up[2]) + dau * (xstar - xu)
            a = np.float32(astar * 255.0)
            b = np.float32(dau * 255.0)
            xc = np.float32(xstar)
            p0 = up[0]
            p1 = dn[1]
            if _tent_verify(vals255[p0 : p1 + 1], x0 + p0, a, b, xc, plat255):
                out.append((y, x0 + p0, x0 + p1, a, b, xc))
                gi = group_end + 1
                continue
        emit_piece(p[0], p[1])
        gi += 1


def _compress_span_rows(acc: np.ndarray, row_lo: int, row_hi: int,
                        plat255: np.float32):
    """Painted canvas -> verified tent lanes with row-range merging.

    Per row, maximal nonzero runs emit tent lanes (_emit_run_tents);
    consecutive rows whose lanes are bit-identical (vertical strokes:
    the per-row computation repeats exactly) merge into one lane
    covering up to SPAN_ROW_MERGE rows.

    Returns (spans (S, 4) int64 rows (y0, y1, xlo, xhi), a (S,) f32,
    b (S,) f32, xc (S,) f32) in row-major emission order (255-domain
    payload)."""
    lanes = []  # [y0, y1, xlo, xhi, a, b, xc] (mutable for the merge)
    prev_row: list = []  # indices into lanes with y1 == previous row
    prev_y = None
    zero = np.float32(0.0)
    for y in range(row_lo, row_hi + 1):
        line = acc[y]
        nz = np.flatnonzero(line > zero)
        if nz.size == 0:
            prev_row = []
            prev_y = None
            continue
        brk = np.flatnonzero(np.diff(nz) > 1)
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [nz.size - 1]))
        row_out: list = []
        for r0, r1 in zip(starts, ends):
            x0 = int(nz[r0])
            _emit_run_tents(y, x0, line[x0 : int(nz[r1]) + 1], plat255, row_out)
        cur_row = []
        cand = list(prev_row) if prev_y == y - 1 else []
        for lane in row_out:
            yy, xlo, xhi, a, b, xc = lane
            merged = False
            for ci, li in enumerate(cand):
                L = lanes[li]
                if (
                    L[2] == xlo and L[3] == xhi
                    and L[4].tobytes() == a.tobytes()
                    and L[5].tobytes() == b.tobytes()
                    and L[6].tobytes() == xc.tobytes()
                    and (y - L[0]) < SPAN_ROW_MERGE
                ):
                    L[1] = y
                    cur_row.append(li)
                    cand.pop(ci)
                    merged = True
                    break
            if not merged:
                lanes.append([yy, yy, xlo, xhi, a, b, xc])
                cur_row.append(len(lanes) - 1)
        prev_row = cur_row
        prev_y = y
    if not lanes:
        return (
            np.zeros((0, 4), np.int64),
            np.zeros(0, np.float32),
            np.zeros(0, np.float32),
            np.zeros(0, np.float32),
        )
    spans = np.asarray([L[:4] for L in lanes], np.int64)
    a = np.asarray([L[4] for L in lanes], np.float32)
    b = np.asarray([L[5] for L in lanes], np.float32)
    xc = np.asarray([L[6] for L in lanes], np.float32)
    return spans, a, b, xc


# Module flag for A/B benchmarking (tools/, bench comparisons); the
# production default routes alive solid strokes to the span path.
STROKE_SPANS = True

# Per-segment path choice: a segment routes to tent lanes when its
# lane estimate is within SPAN_VS_ITEM x its item-window count.
# Measured on the 97-tile corpus (device trace, same session):
# items-only 6.90 ms, ratio 8 5.64 ms, ratio 32 5.10 ms ~= route-all
# 5.08 ms — the transpose-free lane cost (~2.5 ns/lane) beats the
# ~40 ns/window item path on essentially all alive solid geometry, so
# the default effectively routes everything alive; the finite ratio
# remains as a guard for pathological shapes (enormous-hw casings
# whose rows dwarf their window count).  Pure count arithmetic,
# mirrored bit-for-bit by the C++ assembler.
SPAN_VS_ITEM = 32


def _stroke_span_cost_est(g: np.ndarray, c_hw: float, ts: int) -> np.ndarray:
    """Per-segment estimate of emitted tent lanes: ~1 per touched row
    (a run compresses to one clipped tent); vertical segments row-merge
    their (identical) body rows in SPAN_ROW_MERGE blocks, keeping ~2m
    distinct end rows."""
    gi = g.astype(np.int64)
    m = int(np.ceil(c_hw)) + 2
    ylo = np.clip(np.minimum(gi[:, 1], gi[:, 3]) - m, 0, ts - 1)
    yhi = np.clip(np.maximum(gi[:, 1], gi[:, 3]) + m, 0, ts - 1)
    rows = yhi - ylo + 1
    vert = gi[:, 0] == gi[:, 2]
    est = np.where(vert, (rows + SPAN_ROW_MERGE - 1) // SPAN_ROW_MERGE + 2 * m, rows)
    nondeg = ~(vert & (gi[:, 1] == gi[:, 3]))
    return np.where(nondeg, est, 0)


def _route_stroke_spans(chunks, ts: int):
    """Replace each solid KIND_STROKE chunk with gradient-span chunks
    for its provably-alive, span-cheaper segments plus (if any) one
    KIND_STROKE remainder chunk for the rest (dead-start segments and
    item-cheaper alive ones) — same generation, `last` only on the
    final piece.  Cross-piece overlap is exact because the kernel
    merges a generation's chunks with fmax."""
    if not STROKE_SPANS:
        return chunks
    out = []
    for tup in chunks:
        k, g, trav, prof, last = tup[:5]
        meta = tup[5:]
        c_color, c_op, c_hw, c_pat = meta
        n = g.shape[0]
        if k != KIND_STROKE or n == 0:
            out.append(tup)
            continue
        if np.any(np.asarray(prof)[:n]):
            out.append(tup)  # dashed: item / per-segment path
            continue
        alive = _seg_all_alive(g, c_hw)
        span_est = _stroke_span_cost_est(g, c_hw, ts)
        item_est = _stroke_item_counts(g, c_hw, ts)
        span_sel = alive & (span_est <= SPAN_VS_ITEM * item_est)
        acc, rlo, rhi = (
            _stroke_span_raster(g[span_sel], c_hw, c_op, ts)
            if span_sel.any()
            else (None, 0, -1)
        )
        if rhi >= rlo:
            spans, sa, sb, sxc = _compress_span_rows(
                acc, rlo, rhi, _span_plat255(c_hw, c_op)
            )
        else:
            spans = np.zeros((0, 4), np.int64)
            sa = sb = sxc = np.zeros(0, np.float32)
        abc = np.stack([sa, sb, sxc], axis=1)  # (S, 3) trav-slot payload
        rest = ~span_sel
        pieces = []
        # One chunk per CH lanes, full tile width, row-walk order.
        # Measured dead ends (r5, true device time): static 128-col
        # half sectioning dropped occupancy ~25%; re-ORDERING lanes by
        # column half (pure, or keyed by 64/128-row superblocks)
        # traded the width-128 window (_derive_col_windows) against an
        # equal-or-larger nb growth — every variant was a wash or
        # worse than row-walk order.  The window still fires on the
        # ~20% of chunks that are naturally x-local (more at @2x).
        S = spans.shape[0]
        for off in range(0, S, CH):
            end = min(off + CH, S)
            pieces.append(
                (KIND_STROKE_SPAN, spans[off:end], abc[off:end],
                 np.zeros(end - off, np.int64))
            )
        if rest.any():
            pieces.append(
                (KIND_STROKE, g[rest], np.asarray(trav)[:n][rest],
                 np.asarray(prof)[:n][rest])
            )
        if not pieces:  # nothing painted and no dead segs: keep an
            # empty span chunk so the generation's `last` still blends.
            pieces.append((KIND_STROKE_SPAN, np.zeros((0, 4), np.int64),
                           abc[:0], np.zeros(0, np.int64)))
        for pi, p in enumerate(pieces):
            is_tail = pi + 1 == len(pieces)
            out.append(p + (last if is_tail else False,) + meta)
    return out


def _emit_windows(seg_ids, b0col, nbcol):
    """Flat item words `sg | (block << 8)` for one column subrange."""
    tot = int(nbcol.sum())
    if not tot:
        return np.zeros(0, dtype=np.int32)
    sg_rep = np.repeat(seg_ids, nbcol)
    starts = np.repeat(b0col, nbcol)
    offs = np.concatenate(([0], np.cumsum(nbcol)[:-1]))
    pos = np.arange(tot, dtype=np.int64) - np.repeat(offs, nbcol)
    return (sg_rep | ((starts + pos) << 8)).astype(np.int32)


def _stroke_items(g: np.ndarray, c_hw: float, ts: int):
    """Work items for a solid (or chain-free dashed) stroke chunk.

    An item is one window that the segment's paint margin can touch.
    Window shape is chosen per segment for lane occupancy — the
    predicates the kernel evaluates (in-line, ownership, aliveness) are
    global geometry, so a window only partitions work; evaluating a
    pixel from any window paints exactly the reference value, which is
    what makes duplicate padding and shape choices output-invariant:

    * shallow alive segments (|dy| <= |dx|, incl. horizontal axis):
      (8-row, 128-col half) windows, `sg | (r8 << 8)`, section slots
      [0, n_halves) — 4 items per (32, 128) vector tile;
    * steep alive segments (|dy| > |dx|, incl. vertical axis):
      (16-row, 64-col) windows, `sg | (r16 << 8) | (sub << 14)` with
      `sub` the 64-col parity inside the 128-half, slots
      [4, 4 + n_halves) — 4 items per (32, 128) tile as 2 row-pairs x
      2 lane-halves (verticals paint ~5 of 128 columns, so half-width
      windows quarter their evaluated pixels);
    * segments with (possibly) dead walk starts: (8, 128) windows in
      slots [8, 8 + n_halves) (full dead-start machinery).

    Axis-aligned segments need no special section: with mn = 0 the
    general ownership math collapses (T = m0, no gap/edge bands) and
    every owner start lies on the line, so _seg_all_alive routes them
    alive and the general-alive formulas reproduce the old axis path
    bit-for-bit.

    Steep sections interleave sub-half lists as group quadruples
    (sub0, sub0, sub1, sub1); a missing side is padded with duplicates
    from the other (safe by the global-predicate argument above).

    Returns (items int32 (IT,), isec int32 (NSEC,) cumulative section
    ends)."""
    n = g.shape[0]
    n_halves = ts // 128
    assert n_halves <= 4, "item path supports ts <= 512"
    isec = np.zeros(NSEC, dtype=np.int32)
    if n == 0:
        return np.zeros(0, dtype=np.int32), isec
    gi = g.astype(np.int64)
    x1, y1, x2, y2 = gi[:, 0], gi[:, 1], gi[:, 2], gi[:, 3]
    m = int(np.ceil(c_hw)) + 1
    b0w8, nblkw8 = _seg_sub_blocks(gi, m, ts, 128, RB_I)
    b0w16, nblkw16 = _seg_sub_blocks(gi, m, ts, 64, RB16)

    steep = np.abs(y2 - y1) > np.abs(x2 - x1)
    alive = _seg_all_alive(g, c_hw)
    cls = np.where(~alive, 2, np.where(steep, 1, 0))
    seg_ids = np.arange(n, dtype=np.int64)

    if int(np.where(cls == 1, nblkw16.sum(axis=1), nblkw8.sum(axis=1)).sum()) == 0:
        return np.zeros(0, dtype=np.int32), isec

    # Per (steep segment, half): the (16, 64) emission pays only when
    # its paired-and-padded cost beats plain (8, 128) windows (a lone
    # street's items all land in one 64-col sub-half, and equalizing the
    # two sub-half lists with duplicates can double them).  The choice
    # is purely count-arithmetic, so the C++ assembler reproduces it
    # bit-for-bit (native/assembler.cpp stroke_items).
    steep_secs = []   # per half: interleaved quadruple array
    spill8 = []       # per half: bool mask of steep segs spilled to (8,128)
    for h in range(n_halves):
        subs = []
        for sub in range(2):
            nb = np.where(cls == 1, nblkw16[:, 2 * h + sub], 0)
            sec_s = _emit_windows(seg_ids, b0w16[:, 2 * h + sub], nb)
            subs.append(sec_s | np.int32(sub << 14))
        L0, L1 = subs
        n_pairs = max((len(L0) + 1) // 2, (len(L1) + 1) // 2)
        cost16 = 4 * n_pairs
        raw8 = int(np.where(cls == 1, nblkw8[:, h], 0).sum())
        if n_pairs and cost16 < raw8:
            fill0 = L0[-1] if len(L0) else L1[-1]
            fill1 = L1[-1] if len(L1) else L0[-1]
            A = np.concatenate(
                [L0, np.full(2 * n_pairs - len(L0), fill0, np.int32)]
            )
            B = np.concatenate(
                [L1, np.full(2 * n_pairs - len(L1), fill1, np.int32)]
            )
            sec = np.empty(4 * n_pairs, np.int32)
            sec[0::4] = A[0::2]
            sec[1::4] = A[1::2]
            sec[2::4] = B[0::2]
            sec[3::4] = B[1::2]
            steep_secs.append(sec)
            spill8.append(False)
        else:
            steep_secs.append(np.zeros(0, dtype=np.int32))
            spill8.append(raw8 > 0)

    parts = []
    end = 0
    for path_cls in range(3):
        slot_base = 4 * path_cls
        for h in range(n_halves):
            if path_cls == 1:
                sec = steep_secs[h]
            else:
                cmask = cls == path_cls
                if path_cls == 0 and spill8[h]:
                    cmask = cmask | (cls == 1)
                nb = np.where(cmask, nblkw8[:, h], 0)
                sec = _emit_windows(seg_ids, b0w8[:, h], nb)
                pad = (-len(sec)) % 4
                if pad:
                    # Pad with DUPLICATES of the last real item: the
                    # kernel emit is an fmax, so re-evaluating an item
                    # is a no-op, and the kernel drops per-group pad
                    # masking.
                    sec = np.concatenate([sec, np.repeat(sec[-1:], pad)])
            parts.append(sec)
            end += len(sec)
            isec[slot_base + h] = end
        # empty high slots keep the running end so [start, end) is empty
        for h in range(n_halves, 4):
            isec[slot_base + h] = end
    return np.concatenate(parts), isec


def _split_big_stroke_chunks(chunks, ts: int, prof_chain_free=None):
    """Split item-path stroke chunks (solid, or chain-free dashed)
    whose work-item total exceeds IT_CAP into several chunks of the
    same generation (last only on the tail)."""
    out = []
    for tup in chunks:
        k, g, trav, prof, last = tup[:5]
        meta = tup[5:]
        c_hw = meta[2]
        if k != KIND_STROKE or g.shape[0] == 0:
            out.append(tup)
            continue
        pr = np.asarray(prof)[: g.shape[0]]
        if np.any(pr) and not (
            prof_chain_free is not None and np.all(prof_chain_free[pr])
        ):
            out.append(tup)
            continue
        counts = _stroke_item_counts(g, c_hw, ts)
        if counts.sum() <= IT_CAP:
            out.append(tup)
            continue
        cum = np.cumsum(counts)
        start = 0
        while start < g.shape[0]:
            base = cum[start - 1] if start else 0
            endi = int(np.searchsorted(cum, base + IT_CAP, side="right"))
            endi = max(endi, start + 1)
            is_tail = endi >= g.shape[0]
            out.append(
                (k, g[start:endi], trav[start:endi], prof[start:endi],
                 last if is_tail else False) + meta
            )
            start = endi
    return out


def build_tile_chunks(stream, ts: int, prof_chain_free=None) -> TileChunks:
    """One TileStream -> device-ready per-tile chunk arrays (fills
    converted to scanline spans, stroke aux scalars precomputed).

    `prof_chain_free`: optional bool array per dash-profile index (True
    = no round-cap originals); chain-free dashed chunks then take the
    work-item path (KIND_STROKE_DASH*).

    An empty stream still yields one PAD chunk so the tile's canvas is
    initialized."""
    chunks = _convert_tile_chunks(stream, ts)
    if ts <= 512:
        chunks = _route_stroke_spans(chunks, ts)
        chunks = _split_big_stroke_chunks(chunks, ts, prof_chain_free)
    n_chunks = max(len(chunks), 1)

    geom = np.zeros((n_chunks, 4, CH), dtype=np.int32)
    trav = np.zeros((n_chunks, 1, CH), dtype=np.float32)
    sprof = np.zeros((n_chunks, 1, CH), dtype=np.int32)
    aux = np.zeros((n_chunks, 4, CH), dtype=np.float32)
    kind = np.zeros((n_chunks,), dtype=np.int32)
    cnt = np.zeros((n_chunks,), dtype=np.int32)
    last = np.zeros((n_chunks,), dtype=np.int32)
    y0 = np.zeros((n_chunks,), dtype=np.int32)
    nb = np.zeros((n_chunks,), dtype=np.int32)
    prim_y0 = np.zeros((n_chunks,), dtype=np.int32)
    prim_nb = np.zeros((n_chunks,), dtype=np.int32)
    color = np.zeros((n_chunks, 3), dtype=np.float32)
    opacity = np.zeros((n_chunks,), dtype=np.float32)
    hw = np.zeros((n_chunks,), dtype=np.float32)
    pat = np.full((n_chunks,), -1, dtype=np.int32)
    item_lists: dict = {}
    isec = np.zeros((n_chunks, NSEC), dtype=np.int32)

    if chunks:
        chunk_meta = []
        for ci in range(n_chunks):
            k, g, _, _, _, _, _, c_hw, _ = chunks[ci]
            n = g.shape[0]
            assert n <= CH, f"chunk of {n} exceeds CH={CH}"
            if k == KIND_STROKE_SPAN:
                # Tent lanes: row range in columns 0 (y0) / 1 (y1).
                ylo = g[:, 0].min() if n else 0
                yhi = g[:, 1].max() if n else 0
            elif k in (KIND_FILL, KIND_FILL_IMAGE):
                # Span chunks: y in column 0.
                ylo = g[:, 0].min() if n else 0
                yhi = g[:, 0].max() if n else 0
            elif k == KIND_LAYER:
                ylo = g[:, [1, 3]].min() if n else 0
                yhi = g[:, [1, 3]].max() if n else 0
            else:
                m = int(np.ceil(c_hw)) + 2
                ylo = (g[:, [1, 3]].min() - m) if n else 0
                yhi = (g[:, [1, 3]].max() + m) if n else 0
            ylo = int(max(min(ylo, ts - 1), 0))
            yhi = int(max(min(yhi, ts - 1), 0))
            b0 = ylo // RB_F
            nblocks = yhi // RB_F - b0 + 1 if n else 0
            chunk_meta.append((b0, nblocks))

        prim_rows = {}
        start = 0
        for ci in range(n_chunks):
            if chunks[ci][4]:
                blocks = [chunk_meta[j] for j in range(start, ci + 1) if chunk_meta[j][1]]
                if blocks:
                    p0 = min(b for b, _ in blocks)
                    pn = max(b + n_ for b, n_ in blocks) - p0
                else:
                    p0, pn = 0, 0
                prim_rows[ci] = (p0, pn)
                start = ci + 1

        for ci in range(n_chunks):
            k, g, c_trav, c_prof, c_last, c_color, c_op, c_hw, c_pat = chunks[ci]
            n = g.shape[0]
            o = ci
            kind[o] = k
            cnt[o] = n
            last[o] = int(c_last)
            y0[o], nb[o] = chunk_meta[ci]
            if c_last:
                prim_y0[o], prim_nb[o] = prim_rows[ci]
            color[o] = c_color
            opacity[o] = c_op
            hw[o] = c_hw
            pat[o] = c_pat
            if n and k in (KIND_FILL, KIND_FILL_IMAGE):
                geom[o, :, :n] = g.T.astype(np.int32)
                # Pad lanes so they cover nothing: no row match and an
                # empty x interval.
                geom[o, 0, n:] = -1
                geom[o, 1, n:] = 1
            elif n and k == KIND_STROKE_SPAN:
                # Tent lanes: geometry (y0, y1, xlo, xhi); (a, b, xc)
                # ride the f32 aux lanes 0..2 (the trav-slot of the
                # routed tuple is the (n, 3) payload), read vectorized
                # by the kernel.  Pad lanes cover no row and an empty
                # x interval.
                geom[o, :, :n] = g.T.astype(np.int32)
                geom[o, 0, n:] = -1
                geom[o, 1, n:] = -2
                geom[o, 2, n:] = 1
                aux[o, 0:3, :n] = np.asarray(c_trav, np.float32).T
            elif n:
                geom[o, :, :n] = g.T.astype(np.int32)
                trav[o, 0, :n] = c_trav
                sprof[o, 0, :n] = c_prof
                if k == KIND_STROKE:
                    # Host-precomputed per-segment scalars (exact in f32
                    # under the coordinate bound): 1/|d|, the staircase
                    # inversion ratio, and h(K) = K + g(K).
                    gi = g.astype(np.int64)
                    dx = np.abs(gi[:, 2] - gi[:, 0])
                    dy = np.abs(gi[:, 3] - gi[:, 1])
                    mn = np.minimum(dx, dy)
                    mx = np.maximum(np.maximum(dx, dy), 1)
                    den = np.sqrt((dx * dx + dy * dy).astype(np.float32))
                    aux[o, 0, :n] = np.where(den > 0, 1.0 / np.maximum(den, 1e-9), 0.0)
                    aux[o, 1, :n] = (mx * mx).astype(np.float32) / (
                        (mx * mx + mn * mn).astype(np.float32)
                    )
                    cK = (2 * mx * mn + mx - 1) // (2 * mx)
                    gK = (2 * cK * mn + mx - 1) // (2 * mx)
                    aux[o, 2, :n] = (mx + gK).astype(np.float32)
                    pr = np.asarray(c_prof)[:n]
                    is_solid = not np.any(pr)
                    is_chain_free_dash = (
                        not is_solid
                        and prof_chain_free is not None
                        and bool(np.all(prof_chain_free[pr]))
                    )
                    if (is_solid or is_chain_free_dash) and ts <= 512:
                        # Solid and chain-free dashed strokes take the
                        # work-item path (4 packed (8, 128) windows per
                        # vector tile); per-SEGMENT routing into the
                        # axis / general-alive / general-dead sections
                        # happens inside _stroke_items (_seg_all_alive),
                        # so there is no per-chunk wide/thin kind split
                        # anymore.
                        kind[o] = KIND_STROKE_SOLID if is_solid else KIND_STROKE_DASH
                        it, sec = _stroke_items(g, c_hw, ts)
                        item_lists[o] = it
                        isec[o] = sec

    it_tile = max([len(v) for v in item_lists.values()] + [4])
    it_tile = -(-it_tile // 4) * 4
    items = np.full((n_chunks, 1, it_tile), -1, dtype=np.int32)
    for o, v in item_lists.items():
        items[o, 0, : len(v)] = v

    return _pad_group(
        TileChunks(
            geom, trav, sprof, aux, kind, cnt, last, y0, nb,
            prim_y0, prim_nb, color, opacity, hw, pat, items, isec,
        )
    )


def _group_align_indices(pat: np.ndarray, group: int) -> List[int]:
    """Order-preserving chunk index list (with -1 pads) whose length is
    a multiple of `group` and where each group-block contains at most
    one distinct pattern index >= 0 (the kernel fetches one pattern
    block per grid step)."""
    idx: List[int] = []
    cur = -1
    for i, p in enumerate(pat.tolist()):
        if len(idx) % group == 0:
            cur = -1
        if p >= 0:
            if cur >= 0 and p != cur:
                while len(idx) % group:
                    idx.append(-1)
                cur = -1
            if cur < 0:
                cur = p
        idx.append(i)
    while len(idx) % group:
        idx.append(-1)
    return idx


def _derive_col_windows(tc: TileChunks) -> TileChunks:
    """Write each fill/span chunk's 128-column window into slot 0 of
    its (item-only, otherwise unused) isec row: 1 + half index when
    every lane's x-interval lands inside one 128-col half of the tile,
    0 for full width.  The kernel branches on this SMEM scalar to run
    the coverage matmuls at width 128 (bench corpus: 93% of fill
    chunks; ~20% of span chunks are naturally x-local, more at @2x —
    re-ordering span lanes to raise that measured worse, see
    _route_stroke_spans).  Derived here, after assembly, so both the
    Python and native assembly paths share one implementation."""
    kind = tc.kind
    sel = (
        (kind == KIND_FILL) | (kind == KIND_FILL_IMAGE)
        | (kind == KIND_STROKE_SPAN)
    )
    if not sel.any():
        return tc
    is_span = kind == KIND_STROKE_SPAN
    xlo = np.where(is_span[:, None], tc.geom[:, 2, :], tc.geom[:, 1, :])
    xhi = np.where(is_span[:, None], tc.geom[:, 3, :], tc.geom[:, 2, :])
    ok = xlo <= xhi  # pad lanes carry the empty interval (1, 0)
    big = np.int64(1) << 30
    xmn = np.where(ok, xlo, big).min(axis=1)
    xmx = np.where(ok, xhi, -1).max(axis=1)
    one = sel & (xmn >= 0) & (xmx >= 0) & ((xmn >> 7) == (xmx >> 7))
    isec = tc.isec.copy()
    isec[:, 0] = np.where(
        one, (xmn >> 7) + 1, np.where(sel, 0, isec[:, 0])
    ).astype(isec.dtype)
    return tc._replace(isec=isec)


def _pad_group(tc: TileChunks, group: int = GROUP) -> TileChunks:
    """Pad a tile's chunk list to a multiple of GROUP with PAD chunks
    (and pattern-align it) so grid steps never straddle tiles."""
    tc = _derive_col_windows(tc)
    idx = _group_align_indices(tc.pat, group)
    if len(idx) == tc.kind.shape[0]:
        return tc
    take = np.array([i if i >= 0 else 0 for i in idx], dtype=np.int64)
    pad_row = np.array([i < 0 for i in idx], dtype=bool)

    def gather(a, pad_value=0):
        out = a[take].copy()
        out[pad_row] = pad_value
        return out

    return TileChunks(
        gather(tc.geom), gather(tc.trav), gather(tc.sprof), gather(tc.aux),
        gather(tc.kind), gather(tc.cnt), gather(tc.last), gather(tc.y0),
        gather(tc.nb), gather(tc.prim_y0), gather(tc.prim_nb),
        gather(tc.color), gather(tc.opacity), gather(tc.hw),
        gather(tc.pat, -1), gather(tc.items, -1), gather(tc.isec),
    )


def concat_pallas_batch(
    tile_chunks: List[TileChunks], profiles, ts: int, patterns=None
) -> PallasBatch:
    """Stack per-tile chunk arrays into one flat batch (pure
    concatenation — the serving path's per-request cost on cache hits).
    The chunk total is bucketed (next_bucket) for stable jit
    signatures; PAD rows route to the last tile's (already resident)
    output block and do nothing."""
    T = len(tile_chunks)
    counts = [c.kind.shape[0] for c in tile_chunks]
    total = sum(counts)
    # Per-tile counts are GROUP-aligned (_pad_group); the global bucket
    # must stay a multiple of GROUP so trailing pads form whole steps.
    # A misaligned tile would let a grid step straddle tiles and render
    # into the wrong output block — fail loudly instead.
    assert all(c % GROUP == 0 for c in counts), (
        f"per-tile chunk counts not GROUP={GROUP}-aligned: {counts}"
    )
    Ctot = -(-next_bucket(max(total, 8), 8) // GROUP) * GROUP
    pad = Ctot - total

    tile_id = np.repeat(np.arange(T, dtype=np.int32), counts)
    if pad:
        tile_id = np.concatenate(
            [tile_id, np.full(pad, max(T - 1, 0), dtype=np.int32)]
        )
    first = np.zeros((Ctot,), dtype=np.int32)
    first[np.concatenate(([0], np.cumsum(counts)[:-1]))] = 1

    def cat(field: str, pad_value=0):
        parts = [getattr(c, field) for c in tile_chunks]
        out = np.concatenate(parts, axis=0)
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (out.ndim - 1)
            out = np.pad(out, widths, constant_values=pad_value)
        return out

    # Work items: per-tile IT widths differ; right-pad every tile's
    # items to the batch maximum.  Bucket to powers of two (min 256) so
    # serving sees a handful of jit signatures, not one per distinct
    # width — each Mosaic compile costs minutes on some hosts.  Padding
    # beyond isec[NSEC-1] is never read by the kernel, so wider buckets cost
    # only the (DMA-ed, tiny) dead lanes.
    IT = max(c.items.shape[2] for c in tile_chunks)
    IT = max(256, 1 << (IT - 1).bit_length())
    item_parts = [
        c.items
        if c.items.shape[2] == IT
        else np.pad(
            c.items, ((0, 0), (0, 0), (0, IT - c.items.shape[2])),
            constant_values=-1,
        )
        for c in tile_chunks
    ]
    items = np.concatenate(item_parts, axis=0)
    if pad:
        items = np.pad(items, ((0, pad), (0, 0), (0, 0)), constant_values=-1)

    prof_rows, prof_totals = profiles.arrays(np.float32)
    if patterns is not None and patterns.tiles:
        pat_arr = patterns.array()
    else:
        pat_arr = np.zeros((1, 4, ts, ts), dtype=np.float32)
    return PallasBatch(
        cat("geom"), cat("trav"), cat("sprof"), cat("aux"),
        tile_id, first,
        cat("kind"), cat("cnt"), cat("last"), cat("y0"), cat("nb"),
        cat("prim_y0"), cat("prim_nb"), cat("color"), cat("opacity"),
        cat("hw"), prof_rows, prof_totals, cat("pat", -1), pat_arr,
        items, cat("isec"),
    )


def build_pallas_batch(
    tile_streams, profiles, ts: int, patterns=None, dash_items: bool = True
) -> PallasBatch:
    """Convert TileStream chunk lists into the flat chunk-aligned layout
    (no per-tile padding).  Fill chunks are converted to scanline-span
    chunks (see _convert_tile_chunks).

    `patterns` is an optional PatternTable (draw/primitives.py) holding
    the batch's tiled fill-image icons; chunk kind KIND_FILL_IMAGE
    references it by index.  `dash_items=False` keeps chain-free dashes
    on the per-segment KIND_STROKE path (test harness for comparing the
    two implementations)."""
    mask = profiles.chain_free_mask() if dash_items else None
    return concat_pallas_batch(
        [build_tile_chunks(s, ts, mask) for s in tile_streams],
        profiles, ts, patterns,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _floor_div_f(u, v_f, v_i):
    """Exact floor division of int32 u by positive int32 v (|u| < 2^30),
    via f32 estimate + one integer correction each way (the f32 estimate
    is within 1 for all magnitudes arising under the coordinate bound)."""
    q = jnp.floor(u.astype(jnp.float32) * (1.0 / v_f)).astype(jnp.int32)
    r = u - q * v_i
    q = jnp.where(r < 0, q - 1, q)
    r = u - q * v_i
    q = jnp.where(r >= v_i, q + 1, q)
    return q


def _divmod_f(u, v_f, v_i):
    q = _floor_div_f(u, v_f, v_i)
    return q, u - q * v_i


def _feather(cd, hlw):
    feather_from = jnp.fmax(hlw - 0.5, 0.0)
    feather_to = jnp.fmax(hlw + 0.5, 1.0)
    opacity_mul = jnp.fmin(2.0 * hlw, 1.0)
    v = jnp.where(
        cd < feather_from,
        1.0,
        jnp.where(cd < feather_to, (feather_to - cd) / (feather_to - feather_from), 0.0),
    )
    return opacity_mul * v


def make_render_kernel(ts: int):
    """Returns the pallas kernel fn for the given static config."""

    def kernel(
        # scalar prefetch (SMEM)
        tile_s, first_s, kind_s, cnt_s, last_s, y0_s, nb_s,
        prim_y0_s, prim_nb_s,
        color_r_s, color_g_s, color_b_s, opacity_s, hw_s,
        prof_s, prof_total_s, canvas_s, pat_s,
        step_tile_s, step_pat_s, tile_last_s, isec_s,
        step_dash_s, step_stroke_s, step_solid_s,
        # tensor inputs (VMEM blocks)
        geom_ref,      # (GROUP, 4, CH) int32
        trav_ref,      # (GROUP, 1, CH) f32
        sprof_ref,     # (GROUP, 1, CH) int32
        aux_ref,       # (GROUP, 4, CH) f32
        pat_ref,       # (1, 4, ts, ts) f32 tiled premultiplied fill icon
        items_ref,     # (GROUP, 1, IT) int32 solid-stroke work items
        # outputs
        out_ref,       # (1, 4, ts, ts) u8 (finalized on each tile's last chunk)
        # scratch
        acc_ref,       # (4, ts, ts) f32 premultiplied RGBA accumulator
        pending_ref,   # (ts, ts) f32
        geom_smem,     # SMEM (4, CH) int32
        trav_smem,     # SMEM (1, CH) f32
        sprof_smem,    # SMEM (1, CH) int32
        aux_smem,      # SMEM (4, CH) f32
        items_smem,    # SMEM (1, IT) int32
        dma_sems,      # DMA semaphores (5,)
    ):
        tc = pl.program_id(0)

        def chunk_body(gi, _):
            ch = tc * GROUP + gi

            @pl.when(first_s[ch] == 1)
            def _init():
                cr = canvas_s[0]
                cg = canvas_s[1]
                cb = canvas_s[2]
                acc_ref[0] = jnp.full((ts, ts), cr, jnp.float32)
                acc_ref[1] = jnp.full((ts, ts), cg, jnp.float32)
                acc_ref[2] = jnp.full((ts, ts), cb, jnp.float32)
                acc_ref[3] = jnp.ones((ts, ts), jnp.float32)
                pending_ref[...] = jnp.zeros((ts, ts), jnp.float32)

            kind = kind_s[ch]

            # Everything below is a no-op on PAD chunks; one outer
            # region keeps the pad-step scalar cost to a single
            # predicate (trailing bucket pads are ~14% of steps).
            @pl.when(kind != KIND_PAD)
            def _work():
                cnt = cnt_s[ch]
                is_stroke = (
                    (kind >= KIND_STROKE) & (kind <= KIND_STROKE_SOLID)
                ) | (kind == KIND_STROKE_DASH)

                # Stage the chunk's geometry into SMEM (strokes only — the
                # scalar-driven segment loop needs per-lane scalar loads, which
                # Mosaic can't do from VMEM; fills read geometry vectorized).
                @pl.when(is_stroke)
                def _stage_geom_aux():
                    cp0 = pltpu.make_async_copy(geom_ref.at[gi], geom_smem, dma_sems.at[0])
                    cp3 = pltpu.make_async_copy(aux_ref.at[gi], aux_smem, dma_sems.at[3])
                    cp0.start(); cp3.start()
                    cp0.wait(); cp3.wait()

                @pl.when((kind == KIND_STROKE) | (kind == KIND_STROKE_DASH))
                def _stage_stroke_aux():
                    cp1 = pltpu.make_async_copy(trav_ref.at[gi], trav_smem, dma_sems.at[1])
                    cp2 = pltpu.make_async_copy(sprof_ref.at[gi], sprof_smem, dma_sems.at[2])
                    cp1.start(); cp2.start()
                    cp1.wait(); cp2.wait()
                nb = nb_s[ch]
                y0 = y0_s[ch]
                opacity = opacity_s[ch]
                hw = hw_s[ch]

                xs_half = lax.broadcasted_iota(jnp.int32, (RB, 128), 1)
                rows_half = lax.broadcasted_iota(jnp.int32, (RB, 128), 0)
                sub_col = lax.broadcasted_iota(jnp.int32, (32, 1), 0)
                lane_col = lax.broadcasted_iota(jnp.int32, (32, 128), 1)
                n_halves = ts // 128

                # ------------------------- fills -------------------------
                # Host-extracted scanline spans (draw/spans.py); the kernel just
                # paints them with a coverage matmul on the MXU per 32-row
                # block: covered = (U @ W) > 0 with U[r,s] = (y_s == r) and
                # W[s,x] = (xlo_s <= x <= xhi_s).  0/1 bf16 operands with f32
                # accumulation (sums <= CH=128) are exact, so fill membership is
                # byte-identical to the reference's scanline fill.
                @pl.when((kind == KIND_FILL) | (kind == KIND_FILL_IMAGE))
                def _fill():
                    y_l = geom_ref[gi, 0, :].reshape(1, CH)
                    xlo_l = geom_ref[gi, 1, :].reshape(1, CH)
                    xhi_l = geom_ref[gi, 2, :].reshape(1, CH)
                    # Column-half window: most fill chunks cover a tiny
                    # x-range (bench corpus: 93% inside one 128-col
                    # half, median spread 19 px), so the W-build and
                    # the coverage matmul run at width 128 when the
                    # chunk's lanes land in one half.  The half is
                    # derived on the HOST (_derive_col_windows, slot 0
                    # of the otherwise item-only isec table): an SMEM
                    # scalar predicate is real control flow, where an
                    # in-kernel lane min/max made Mosaic execute both
                    # branches masked (measured +10% full-kernel).
                    colp1 = isec_s[ch * NSEC + 0]

                    def paint(xoff, width):
                        # Lane-major W (x in sublanes, lanes = spans),
                        # contracted on the LANE axis of both operands
                        # like the tent-lane path: the former
                        # sublane-major W needed two (1,CH)->(CH,1)
                        # relayouts per chunk that dominated the fill
                        # path's fixed cost (measured 0.65 us/chunk
                        # fixed vs 0.24 for the relayout-free spans).
                        xs_w = xoff + lax.broadcasted_iota(
                            jnp.int32, (width, CH), 0
                        )
                        Wt = ((xs_w >= xlo_l) & (xs_w <= xhi_l)).astype(
                            jnp.bfloat16
                        )

                        def row_block(blk, _):
                            r0 = (y0 + blk) * RB_F
                            rows_col = r0 + lax.broadcasted_iota(
                                jnp.int32, (RB_F, 1), 0
                            )
                            U = (rows_col == y_l).astype(jnp.bfloat16)
                            C = lax.dot_general(
                                U, Wt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            alpha = jnp.where(C > 0.5, opacity, 0.0)
                            sl = (
                                pl.ds(r0, RB_F),
                                slice(xoff, xoff + width),
                            )
                            cur = pending_ref[sl]
                            pending_ref[sl] = jnp.fmax(cur, alpha)
                            return 0

                        lax.fori_loop(0, nb, row_block, 0)

                    # Static column slices per half (dynamic lane-dim
                    # slices relayout every pending access).
                    for h in range(n_halves):
                        @pl.when(colp1 == h + 1)
                        def _fill_win(h=h):
                            paint(h * 128, 128)

                    @pl.when((colp1 == 0) | (colp1 > n_halves))
                    def _fill_full():
                        paint(0, ts)

                # -------------------- stroke tent lanes --------------------
                # Host-compressed clipped-tent alpha (_route_stroke_spans):
                # lane s covers rows [y0_s, y1_s], columns [xlo_s, xhi_s],
                # alpha*255 = max(min(a_s - b_s*|x - xc_s|, plat255), 0).
                # Lanes are disjoint per (row, x) within a chunk (host
                # fmax-merged), so the coverage matmul's sum selects
                # exactly one lane's value.  bf16 split keeps it exact
                # enough: integer part of alpha*255 is bf16-exact
                # (0..256), the [0, 1) fraction rounds at 2^-9 of one u8
                # step.  Two 1-pass bf16 matmuls instead of a 6-pass f32
                # HIGHEST dot.
                @pl.when(kind == KIND_STROKE_SPAN)
                def _stroke_span():
                    # Everything stays LANE-major (no relayouts): the
                    # value tile M is built transposed — (width, CH)
                    # with x in sublanes, lanes = spans — from (1, CH)
                    # param rows, and the coverage dot contracts the
                    # LANE axis of both operands (NT matmul, native on
                    # the MXU).
                    y0_l = geom_ref[gi, 0, :].reshape(1, CH)
                    y1_l = geom_ref[gi, 1, :].reshape(1, CH)
                    xlo_l = geom_ref[gi, 2, :].reshape(1, CH)
                    xhi_l = geom_ref[gi, 3, :].reshape(1, CH)
                    a_l = aux_ref[gi, 0, :].reshape(1, CH)
                    b_l = aux_ref[gi, 1, :].reshape(1, CH)
                    xc_l = aux_ref[gi, 2, :].reshape(1, CH)
                    plat255 = opacity * jnp.fmin(2.0 * hw, 1.0) * 255.0
                    # Column-half window, host-derived like fills (slot
                    # 0 of isec): fires on the ~20% of span chunks
                    # whose lanes are naturally x-local (more at @2x);
                    # the M-build plus both matmuls then run at width
                    # 128.  Re-ordering lanes to raise the hit rate
                    # measured worse (see _route_stroke_spans).
                    colp1 = isec_s[ch * NSEC + 0]

                    def paint(xoff, width):
                        xs_c = xoff + lax.broadcasted_iota(
                            jnp.int32, (width, CH), 0
                        )
                        cov = (xs_c >= xlo_l) & (xs_c <= xhi_l)
                        tent = a_l - b_l * jnp.abs(
                            xs_c.astype(jnp.float32) - xc_l
                        )
                        M255T = jnp.where(
                            cov, jnp.fmax(jnp.fmin(tent, plat255), 0.0), 0.0
                        )
                        MintT = jnp.floor(M255T)
                        MhiT = MintT.astype(jnp.bfloat16)
                        MloT = (M255T - MintT).astype(jnp.bfloat16)

                        def row_block(blk, _):
                            r0 = (y0 + blk) * RB_F
                            rows_col = r0 + lax.broadcasted_iota(
                                jnp.int32, (RB_F, 1), 0
                            )
                            U = (
                                (rows_col >= y0_l) & (rows_col <= y1_l)
                            ).astype(jnp.bfloat16)
                            dn = (((1,), (1,)), ((), ()))
                            ahi = lax.dot_general(
                                U, MhiT, dn,
                                preferred_element_type=jnp.float32,
                            )
                            alo = lax.dot_general(
                                U, MloT, dn,
                                preferred_element_type=jnp.float32,
                            )
                            alpha = (ahi + alo) * jnp.float32(1.0 / 255.0)
                            sl = (
                                pl.ds(r0, RB_F),
                                slice(xoff, xoff + width),
                            )
                            cur = pending_ref[sl]
                            pending_ref[sl] = jnp.fmax(cur, alpha)
                            return 0

                        lax.fori_loop(0, nb, row_block, 0)

                    # Static column slices per half (see _fill note).
                    for h in range(n_halves):
                        @pl.when(colp1 == h + 1)
                        def _span_win(h=h):
                            paint(h * 128, 128)

                    @pl.when((colp1 == 0) | (colp1 > n_halves))
                    def _span_full():
                        paint(0, ts)

                # ------------------------- strokes -------------------------
                # Per-segment row-block path.  Since the work-item path took
                # over solid strokes, this is traced only for KIND_STROKE
                # (dash profiles; needs trav/sprof and the walk-chain rule),
                # always with solid=False — the solid branches are kept as
                # the reference formulation of the model the item path
                # vectorizes.
                def stroke_impl(solid: bool, wide: bool = False):
                    def seg_step(sg, _):
                        p1x = geom_smem[0, sg]
                        p1y = geom_smem[1, sg]
                        p2x = geom_smem[2, sg]
                        p2y = geom_smem[3, sg]

                        dxs = jnp.abs(p2x - p1x)
                        dys = jnp.abs(p2y - p1y)
                        swap = dxs > dys
                        mn0 = jnp.where(swap, p1y, p1x)
                        mx0 = jnp.where(swap, p1x, p1y)
                        mn_d = jnp.where(swap, dys, dxs)
                        mx_d = jnp.maximum(jnp.where(swap, dxs, dys), 1)
                        x_inc = jnp.where(p1x <= p2x, 1, -1)
                        y_inc = jnp.where(p1y <= p2y, 1, -1)
                        mn_i = jnp.where(swap, y_inc, x_inc)
                        mx_i = jnp.where(swap, x_inc, y_inc)
                        two_mx = 2 * mx_d
                        two_mx_f = two_mx.astype(jnp.float32)
                        nc = p2x * p1y - p2y * p1x
                        sdx = p2x - p1x
                        sdy = p2y - p1y
                        inv_denom = aux_smem[0, sg]

                        if solid:
                            feather_to = jnp.fmax(hw + 0.5, 1.0)
                            om_pos = jnp.fmin(2.0 * hw, 1.0) > 0.0

                            def stroke_opacity(cd, sd):
                                cd_op = _feather(cd, hw)
                                return cd_op, cd_op > 0.0

                            def alive_at(s_mn, s_mx):
                                s_x = jnp.where(swap, s_mx, s_mn)
                                s_y = jnp.where(swap, s_mn, s_mx)
                                raw_s = nc + sdy * s_x - sdx * s_y
                                cd_s = jnp.abs(raw_s.astype(jnp.float32)) * inv_denom
                                return (cd_s < feather_to) & om_pos
                        else:
                            trav = trav_smem[0, sg]
                            pidx = sprof_smem[0, sg]
                            base = pidx * (DS * 8)
                            prow = [
                                [prof_s[base + i * 8 + k] for k in range(8)]
                                for i in range(DS)
                            ]
                            prof_total = prof_total_s[pidx]

                            def stroke_opacity(cd, sd):
                                dist = trav + sd
                                dist = jnp.where(
                                    prof_total > 0.0,
                                    dist - jnp.floor(dist / prof_total) * prof_total,
                                    dist,
                                )
                                sd_op = jnp.zeros_like(cd)
                                cap_dist = jnp.full_like(cd, jnp.inf)
                                any_rows = False
                                for i in range(DS):
                                    s_from, s_to, e_from, e_to, mul, has_orig, oa, ob = prow[i]
                                    in_range = (dist >= s_from) & (dist <= e_to)
                                    basev = jnp.where(
                                        dist <= s_to,
                                        (dist - s_from) / (s_to - s_from),
                                        jnp.where(dist < e_from, 1.0, (e_to - dist) / (e_to - e_from)),
                                    )
                                    sd_op = jnp.fmax(sd_op, jnp.where(in_range, mul * basev, 0.0))
                                    cap_d = jnp.where(
                                        dist < oa, oa - dist, jnp.where(dist <= ob, 0.0, dist - ob)
                                    )
                                    cap_dist = jnp.fmin(
                                        cap_dist,
                                        jnp.where(in_range & (has_orig > 0.0), cap_d, jnp.inf),
                                    )
                                    any_rows = jnp.logical_or(any_rows, s_from < jnp.inf)
                                sd_op = jnp.where(any_rows, sd_op, 1.0)
                                cap_dist = jnp.where(jnp.isinf(cap_dist), 0.0, cap_dist)
                                hlw = jnp.sqrt(hw * hw - cap_dist * cap_dist)
                                cd_op = _feather(cd, hlw)
                                return jnp.fmin(sd_op, cd_op), cd_op > 0.0

                            def alive_at(s_mn, s_mx):
                                s_x = jnp.where(swap, s_mx, s_mn)
                                s_y = jnp.where(swap, s_mn, s_mx)
                                raw_s = nc + sdy * s_x - sdx * s_y
                                cd_s = jnp.abs(raw_s.astype(jnp.float32)) * inv_denom
                                # start distance = |(p - p1) . d| / |d| — exact
                                # int32 dot under the coordinate bound (the
                                # reference's sqrt(long^2 - cd^2) chain loses
                                # ~0.05 px in f32 at long distances, line.rs:120).
                                dot_s = (s_x - p1x) * sdx + (s_y - p1y) * sdy
                                sd_s = jnp.abs(dot_s.astype(jnp.float32)) * inv_denom
                                _, alive = stroke_opacity(cd_s, sd_s)
                                return alive

                            # Round caps on dashes shrink the effective half-width
                            # along the perpendicular, so the walk's first-dead-
                            # pixel cutoff needs the full chain check (see
                            # coverage_np.py); for other profiles in_line is
                            # monotone and owner-start aliveness is exact.
                            any_orig = False
                            for i in range(DS):
                                any_orig = jnp.logical_or(
                                    any_orig,
                                    (prow[i][0] < jnp.float32(1e30)) & (prow[i][5] > 0.0),
                                )

                        ratio = aux_smem[1, sg]
                        K = mx_d
                        hK = aux_smem[2, sg].astype(jnp.int32)

                        ylo = jnp.maximum(
                            jnp.minimum(p1y, p2y) - (jnp.ceil(hw).astype(jnp.int32) + 2), 0
                        )
                        yhi = jnp.minimum(
                            jnp.maximum(p1y, p2y) + (jnp.ceil(hw).astype(jnp.int32) + 2), ts - 1
                        )
                        blk0 = ylo // RB
                        nbs = jnp.where(
                            (p1x == p2x) & (p1y == p2y), 0, (yhi - blk0 * RB) // RB + 1
                        )

                        margin_x = jnp.ceil(hw).astype(jnp.int32) + 2
                        sxlo = jnp.minimum(p1x, p2x) - margin_x
                        sxhi = jnp.maximum(p1x, p2x) + margin_x

                        def row_block(b, _):
                            r0 = (blk0 + b) * RB

                            for half in range(n_halves):
                                col0 = half * 128

                                @pl.when((sxlo < col0 + 128) & (sxhi >= col0))
                                def _do_half(col0=col0):
                                    def _general_impl(col0=col0):
                                        ys = r0 + rows_half
                                        xsv = col0 + xs_half

                                        raw = nc + sdy * xsv - sdx * ys
                                        cd = jnp.abs(raw.astype(jnp.float32)) * inv_denom
                                        if solid:
                                            sd = None
                                        else:
                                            # Exact int32 dot form of the start
                                            # distance (see alive_at).
                                            dot = (xsv - p1x) * sdx + (ys - p1y) * sdy
                                            sd = jnp.abs(dot.astype(jnp.float32)) * inv_denom
                                        op, in_line = stroke_opacity(cd, sd)

                                        MN = jnp.where(swap, ys, xsv)
                                        MX = jnp.where(swap, xsv, ys)
                                        n0 = (MN - mn0) * mn_i
                                        m0 = (MX - mx0) * mx_i
                                        A = 2 * mn_d * n0 + two_mx * m0 + (mx_d - 1)
                                        T_band = _floor_div_f(A, two_mx_f, two_mx)
                                        r_band = A - T_band * two_mx
                                        edge_band = r_band == (two_mx - 1)

                                        if wide:
                                            ownerT_ok = (A >= 0) & (T_band <= hK)
                                            ownerN_ok = (A >= -1) & (T_band + 1 <= hK)
                                            visited = in_line & (
                                                (edge_band & ownerT_ok & ownerN_ok)
                                                | (~edge_band & ownerT_ok)
                                            )
                                            alpha = jnp.where(visited, opacity * op, 0.0)
                                            cur = pending_ref[pl.ds(r0, RB), col0 : col0 + 128]
                                            pending_ref[pl.ds(r0, RB), col0 : col0 + 128] = jnp.fmax(cur, alpha)

                                            # Boundary-band edge pixels (exactly one
                                            # owner in range) need the real owner test;
                                            # they only occur at segment ends on a
                                            # 1-in-2mx column.
                                            needs_exact = (
                                                in_line & edge_band & (ownerT_ok ^ ownerN_ok)
                                            )

                                            @pl.when(jnp.any(needs_exact))
                                            def _exact_boundary():
                                                bc = jnp.clip(T_band, 0, hK)
                                                k = jnp.clip(
                                                    (bc.astype(jnp.float32) * ratio).astype(jnp.int32), 0, K
                                                )
                                                two_mn = 2 * mn_d
                                                c, rc = _divmod_f(two_mn * k + mx_d - 1, two_mx_f, two_mx)
                                                g, rg = _divmod_f(two_mn * c + mx_d - 1, two_mx_f, two_mx)

                                                def step_up(k, c, rc, g, rg):
                                                    rc2 = rc + two_mn
                                                    carry = rc2 >= two_mx
                                                    rc2 = jnp.where(carry, rc2 - two_mx, rc2)
                                                    rg2 = jnp.where(carry, rg + two_mn, rg)
                                                    gcarry = rg2 >= two_mx
                                                    rg2 = jnp.where(gcarry, rg2 - two_mx, rg2)
                                                    return (
                                                        k + 1,
                                                        jnp.where(carry, c + 1, c),
                                                        rc2,
                                                        jnp.where(carry & gcarry, g + 1, g),
                                                        jnp.where(carry, rg2, rg),
                                                    )

                                                def step_down(k, c, rc, g, rg):
                                                    rc2 = rc - two_mn
                                                    borrow = rc2 < 0
                                                    rc2 = jnp.where(borrow, rc2 + two_mx, rc2)
                                                    rg2 = jnp.where(borrow, rg - two_mn, rg)
                                                    gborrow = rg2 < 0
                                                    rg2 = jnp.where(gborrow, rg2 + two_mx, rg2)
                                                    return (
                                                        k - 1,
                                                        jnp.where(borrow, c - 1, c),
                                                        rc2,
                                                        jnp.where(borrow & gborrow, g - 1, g),
                                                        jnp.where(borrow, rg2, rg),
                                                    )

                                                state = (k, c, rc, g, rg)
                                                for _i in range(1):
                                                    down = (state[0] > 0) & (state[0] + state[3] > bc)
                                                    nxt = step_down(*state)
                                                    state = tuple(
                                                        jnp.where(down, n, o) for n, o in zip(nxt, state)
                                                    )
                                                for _i in range(1):
                                                    nxt = step_up(*state)
                                                    up = (state[0] < K) & (nxt[0] + nxt[3] <= bc)
                                                    state = tuple(
                                                        jnp.where(up, n, o) for n, o in zip(nxt, state)
                                                    )
                                                k1, c1, rc1, g1, rg1 = state
                                                is_gap = (k1 + g1) != bc
                                                c_sel = jnp.where(is_gap, c1 + 1, c1)
                                                s_mn_T = mn0 + mn_i * c_sel
                                                dn_T = (MN - s_mn_T) * mn_i

                                                bc2 = jnp.clip(T_band + 1, 0, hK)
                                                nxt = step_up(k1, c1, rc1, g1, rg1)
                                                take2 = (k1 < K) & (nxt[0] + nxt[3] <= bc2)
                                                k2 = jnp.where(take2, nxt[0], k1)
                                                c2 = jnp.where(take2, nxt[1], c1)
                                                g2 = jnp.where(take2, nxt[3], g1)
                                                is_gap2 = (k2 + g2) != bc2
                                                c_sel2 = jnp.where(is_gap2, c2 + 1, c2)
                                                s_mn_N = mn0 + mn_i * c_sel2
                                                dn_N = (MN - s_mn_N) * mn_i

                                                add = needs_exact & (
                                                    (ownerT_ok & (dn_T >= 0))
                                                    | (~ownerT_ok & (dn_N <= 0))
                                                )
                                                alpha2 = jnp.where(add, opacity * op, 0.0)
                                                cur2 = pending_ref[pl.ds(r0, RB), col0 : col0 + 128]
                                                pending_ref[pl.ds(r0, RB), col0 : col0 + 128] = jnp.fmax(
                                                    cur2, alpha2
                                                )

                                            return

                                        bc = jnp.clip(T_band, 0, hK)
                                        k = jnp.clip((bc.astype(jnp.float32) * ratio).astype(jnp.int32), 0, K)
                                        two_mn = 2 * mn_d
                                        c, rc = _divmod_f(two_mn * k + mx_d - 1, two_mx_f, two_mx)
                                        g, rg = _divmod_f(two_mn * c + mx_d - 1, two_mx_f, two_mx)

                                        def step_up(k, c, rc, g, rg):
                                            rc = rc + two_mn
                                            carry = rc >= two_mx
                                            rc = jnp.where(carry, rc - two_mx, rc)
                                            rg2 = jnp.where(carry, rg + two_mn, rg)
                                            gcarry = rg2 >= two_mx
                                            rg2 = jnp.where(gcarry, rg2 - two_mx, rg2)
                                            return (
                                                k + 1,
                                                jnp.where(carry, c + 1, c),
                                                rc,
                                                jnp.where(carry & gcarry, g + 1, g),
                                                jnp.where(carry, rg2, rg),
                                            )

                                        def step_down(k, c, rc, g, rg):
                                            rc = rc - two_mn
                                            borrow = rc < 0
                                            rc = jnp.where(borrow, rc + two_mx, rc)
                                            rg2 = jnp.where(borrow, rg - two_mn, rg)
                                            gborrow = rg2 < 0
                                            rg2 = jnp.where(gborrow, rg2 + two_mx, rg2)
                                            return (
                                                k - 1,
                                                jnp.where(borrow, c - 1, c),
                                                rc,
                                                jnp.where(borrow & gborrow, g - 1, g),
                                                jnp.where(borrow, rg2, rg),
                                            )

                                        # |k_est - k_owner| <= 1: verified exhaustively for
                                        # mx <= 700 (all mn) and by dense random sweep up
                                        # to the coordinate bound (tools + tests/test_spans),
                                        # so one correction step each way suffices.
                                        state = (k, c, rc, g, rg)
                                        for _i in range(1):
                                            down = (state[0] > 0) & (state[0] + state[3] > bc)
                                            nxt = step_down(*state)
                                            state = tuple(jnp.where(down, n, o) for n, o in zip(nxt, state))
                                        for _i in range(1):
                                            nxt = step_up(*state)
                                            up = (state[0] < K) & (nxt[0] + nxt[3] <= bc)
                                            state = tuple(jnp.where(up, n, o) for n, o in zip(nxt, state))
                                        k, c, rc, g, rg = state
                                        h_k = k + g
                                        is_gap = h_k != bc
                                        c_sel = jnp.where(is_gap, c + 1, c)
                                        s_mn_T = mn0 + mn_i * c_sel
                                        s_mx_T = mx0 + mx_i * k

                                        in_slab = (A >= 0) & (T_band <= hK)
                                        dn_T = (MN - s_mn_T) * mn_i

                                        # The walk stops each perpendicular at its FIRST
                                        # not-in-line pixel; round caps on dashes make
                                        # in_line non-monotone along the perpendicular,
                                        # so every intermediate perp pixel must be alive
                                        # too.  Their closed-form positions (validated
                                        # exhaustively against the walk, coverage_np.py):
                                        # step j of branch mul sits at minor
                                        # s_mn + mul*mn_i*j, major s_mx - mul*mx_i*C(j),
                                        # C(j) = max(0, ceil((mul*pe + 2j*mn - mx)/2mx)),
                                        # pe = 2c*mn - 2mx*max(0, ceil((2c*mn - mx)/2mx)).
                                        JMAX_CHAIN = 12

                                        def chain_alive(s_mn_v, s_mx_v, c_sel_v, mul_v, jv):
                                            tcm = 2 * c_sel_v * mn_d
                                            G = jnp.maximum(
                                                0,
                                                _floor_div_f(
                                                    tcm - mx_d + two_mx - 1, two_mx_f, two_mx
                                                ),
                                            )
                                            e0 = mul_v * (tcm - two_mx * G)
                                            ok = jv < jnp.int32(1 << 30)
                                            for jp in range(1, JMAX_CHAIN):
                                                Cjp = jnp.maximum(
                                                    0,
                                                    _floor_div_f(
                                                        e0 + 2 * jp * mn_d - mx_d + two_mx - 1,
                                                        two_mx_f,
                                                        two_mx,
                                                    ),
                                                )
                                                minor = s_mn_v + mul_v * mn_i * jp
                                                major = s_mx_v - mul_v * mx_i * Cjp
                                                ok = ok & (alive_at(minor, major) | (jp >= jv))
                                            return ok

                                        def emit_visited(chain_on):
                                            ok_T = in_slab & alive_at(s_mn_T, s_mx_T)
                                            if chain_on:
                                                mul_T = jnp.where(dn_T >= 0, 1, -1)
                                                ok_T = ok_T & chain_alive(
                                                    s_mn_T, s_mx_T, c_sel, mul_T, jnp.abs(dn_T)
                                                )
                                            ok_Tf = ok_T & ((~edge_band) | (dn_T >= 0))
                                            visited = in_line & ok_Tf
                                            alpha = jnp.where(visited, opacity * op, 0.0)

                                            cur = pending_ref[pl.ds(r0, RB), col0 : col0 + 128]
                                            pending_ref[pl.ds(r0, RB), col0 : col0 + 128] = jnp.fmax(cur, alpha)

                                            # Band-edge pixels (1 column in 2*mx) may belong
                                            # to band T+1 via its mul=-1 branch; evaluate
                                            # that owner only when such pixels exist here.
                                            @pl.when(jnp.any(edge_band & in_line & ~visited))
                                            def _edge_band_owner():
                                                bc2 = jnp.clip(T_band + 1, 0, hK)
                                                nxt = step_up(k, c, rc, g, rg)
                                                take2 = (k < K) & (nxt[0] + nxt[3] <= bc2)
                                                k2 = jnp.where(take2, nxt[0], k)
                                                c2 = jnp.where(take2, nxt[1], c)
                                                g2 = jnp.where(take2, nxt[3], g)
                                                is_gap2 = (k2 + g2) != bc2
                                                c_sel2 = jnp.where(is_gap2, c2 + 1, c2)
                                                s_mn_N = mn0 + mn_i * c_sel2
                                                s_mx_N = mx0 + mx_i * k2
                                                dn_N = (MN - s_mn_N) * mn_i
                                                ok_N = (
                                                    edge_band
                                                    & (A + 1 >= 0)
                                                    & (T_band + 1 <= hK)
                                                    & (dn_N <= 0)
                                                    & alive_at(s_mn_N, s_mx_N)
                                                )
                                                if chain_on:
                                                    ok_N = ok_N & chain_alive(
                                                        s_mn_N, s_mx_N, c_sel2, -1, -dn_N
                                                    )
                                                alpha2 = jnp.where(in_line & ok_N, opacity * op, 0.0)
                                                cur2 = pending_ref[pl.ds(r0, RB), col0 : col0 + 128]
                                                pending_ref[pl.ds(r0, RB), col0 : col0 + 128] = jnp.fmax(cur2, alpha2)

                                        if solid:
                                            emit_visited(False)
                                        else:
                                            # Per-segment runtime gate: the chain only
                                            # matters for profiles with round caps.
                                            @pl.when(~any_orig)
                                            def _plain():
                                                emit_visited(False)

                                            @pl.when(any_orig)
                                            def _with_chain():
                                                emit_visited(True)

                                    if solid:
                                        # Axis-aligned segments (mn_d == 0) collapse the whole
                                        # ownership model: band T = m0 is its own perpendicular
                                        # (c_k = g_k = 0, h(k) = k), there are no gap or edge
                                        # bands (r_band = mx-1 != 2mx-1), and every owner start
                                        # lies on the line (cd = 0, always alive), so
                                        # visited = in_line & (0 <= m0 <= mx).  ~6x fewer vector
                                        # ops on the dominant city-grid geometry.
                                        @pl.when(mn_d == 0)
                                        def _axis_aligned(col0=col0):
                                            ys = r0 + rows_half
                                            xsv = col0 + xs_half
                                            raw = nc + sdy * xsv - sdx * ys
                                            cd = jnp.abs(raw.astype(jnp.float32)) * inv_denom
                                            op, in_line = stroke_opacity(cd, None)
                                            MX = jnp.where(swap, xsv, ys)
                                            m0v = (MX - mx0) * mx_i
                                            visited = in_line & (m0v >= 0) & (m0v <= K)
                                            alpha = jnp.where(visited, opacity * op, 0.0)
                                            cur = pending_ref[pl.ds(r0, RB), col0 : col0 + 128]
                                            pending_ref[pl.ds(r0, RB), col0 : col0 + 128] = jnp.fmax(cur, alpha)

                                        pl.when(mn_d != 0)(_general_impl)
                                    else:
                                        _general_impl()

                            return 0

                        lax.fori_loop(0, nbs, row_block, 0)
                        return 0

                    lax.fori_loop(0, cnt, seg_step, 0)

                # --------------- solid strokes: work-item path ---------------
                # Host-precomputed items (_stroke_items): each is one
                # (segment, 8-row block, 128-col half) window.  The kernel
                # evaluates FOUR items per (32, 128) vector tile — item j
                # occupies sublanes 8j..8j+7 with its own per-row-group
                # parameters — which cuts the (32, 128)-per-segment waste of
                # the row-block path ~4x on thin strokes.
                def stroke_items_impl(dashed: bool = False):
                    cpi = pltpu.make_async_copy(
                        items_ref.at[gi], items_smem, dma_sems.at[4]
                    )
                    cpi.start()
                    cpi.wait()

                    feather_to = jnp.fmax(hw + 0.5, 1.0)
                    om_pos = jnp.fmin(2.0 * hw, 1.0) > 0.0
                    grp_sel = sub_col >> 3       # (32, 1): item index 0..3
                    row_in = sub_col & 7
                    # steep16 slot geometry: 2 row-pairs (16 sublanes) x
                    # 2 lane-halves (64 lanes) per (32, 128) tile.
                    pair_sel = sub_col >> 4      # (32, 1): row-pair 0/1
                    row_in16 = sub_col & 15
                    lane_lo = lane_col < 64      # (32, 128)

                    def vec4(a, b, c, d):
                        return jnp.where(
                            grp_sel == 0, a,
                            jnp.where(grp_sel == 1, b, jnp.where(grp_sel == 2, c, d)),
                        )

                    def vsel16(a, b, c, d):
                        # steep16 quadruple (sub0a, sub0b, sub1a, sub1b):
                        # slot = row-pair + 2*lane-half -> (32, 128).
                        lo = jnp.where(pair_sel == 0, a, b)
                        hi = jnp.where(pair_sel == 0, c, d)
                        return jnp.where(
                            lane_lo,
                            jnp.broadcast_to(lo, (32, 128)),
                            jnp.broadcast_to(hi, (32, 128)),
                        )

                    def eval_group(base, col0, mode):
                        # mode: "alive" (all walk starts provably alive:
                        # closed-form A-interval test, no staircase math;
                        # subsumes axis-aligned segments, whose mn = 0
                        # collapses the same formulas), "steep16" (alive
                        # math on (16, 64) windows for steep segments),
                        # "dead" (full dead-start machinery).  Sections
                        # are padded with duplicates of a real item (the
                        # predicates are global geometry and emit is an
                        # idempotent fmax, so re-evaluating any item in
                        # any window position is output-invariant) — no
                        # pad masking.
                        steep = mode == "steep16"
                        vsel = vsel16 if steep else vec4
                        r0s = []
                        p1xs, p1ys, p2xs, p2ys, invs = ([] for _ in range(5))
                        rats, hKs = [], []
                        travs, pidxs = [], []
                        for j in range(4):
                            w = items_smem[0, base + j]
                            sg = w & 127
                            r0 = ((w >> 8) & 63) * (RB16 if steep else RB_I)
                            r0s.append(r0)
                            p1xs.append(geom_smem[0, sg])
                            p1ys.append(geom_smem[1, sg])
                            p2xs.append(geom_smem[2, sg])
                            p2ys.append(geom_smem[3, sg])
                            invs.append(aux_smem[0, sg])
                            if mode == "dead":
                                rats.append(aux_smem[1, sg])
                            hKs.append(aux_smem[2, sg])
                            if dashed:
                                travs.append(trav_smem[0, sg])
                                pidxs.append(sprof_smem[0, sg])

                        p1x = vsel(*p1xs); p1y = vsel(*p1ys)
                        p2x = vsel(*p2xs); p2y = vsel(*p2ys)
                        inv_denom = vsel(*invs)
                        if mode == "dead":
                            ratio = vsel(*rats)
                        hK = vsel(*hKs).astype(jnp.int32)

                        dxs = jnp.abs(p2x - p1x)
                        dys = jnp.abs(p2y - p1y)
                        swap = dxs > dys
                        mn0 = jnp.where(swap, p1y, p1x)
                        mx0 = jnp.where(swap, p1x, p1y)
                        mn_d = jnp.where(swap, dys, dxs)
                        mx_d = jnp.maximum(jnp.where(swap, dxs, dys), 1)
                        x_inc = jnp.where(p1x <= p2x, 1, -1)
                        y_inc = jnp.where(p1y <= p2y, 1, -1)
                        mn_i = jnp.where(swap, y_inc, x_inc)
                        mx_i = jnp.where(swap, x_inc, y_inc)
                        two_mx = 2 * mx_d
                        two_mn = 2 * mn_d
                        two_mx_f = two_mx.astype(jnp.float32)
                        nc = p2x * p1y - p2y * p1x
                        sdx = p2x - p1x
                        sdy = p2y - p1y
                        K = mx_d

                        if steep:
                            # Row depends on the lane-half's slot pair.
                            ys_lo = jnp.where(pair_sel == 0, r0s[0], r0s[1]) + row_in16
                            ys_hi = jnp.where(pair_sel == 0, r0s[2], r0s[3]) + row_in16
                            ys = jnp.where(
                                lane_lo,
                                jnp.broadcast_to(ys_lo, (32, 128)),
                                jnp.broadcast_to(ys_hi, (32, 128)),
                            )
                            ys_b = ys
                        else:
                            ys = vec4(*r0s) + row_in             # (32, 1)
                            ys_b = jnp.broadcast_to(ys, (32, 128))
                        xsv = col0 + lane_col                    # (32, 128)
                        raw = sdy * xsv + (nc - sdx * ys)
                        cd = jnp.abs(raw.astype(jnp.float32)) * inv_denom
                        op = _feather(cd, hw)
                        in_line = op > 0.0
                        MN = jnp.where(swap, ys_b, xsv)
                        MX = jnp.where(swap, xsv, ys_b)

                        if dashed:
                            # Dash profile along the arc (per-seg path's
                            # stroke_opacity, chain-free: hlw == hw so the
                            # geometric masks above are untouched; only the
                            # emitted alpha picks up min(sd_op, cd_op)).
                            trav_v = vsel(*travs)
                            dot = (xsv - p1x) * sdx + (ys - p1y) * sdy
                            sd = jnp.abs(dot.astype(jnp.float32)) * inv_denom
                            dist = trav_v + sd
                            ptot = vsel(
                                *[prof_total_s[pidxs[j]] for j in range(4)]
                            )
                            dist = jnp.where(
                                ptot > 0.0,
                                dist - jnp.floor(dist / ptot) * ptot,
                                dist,
                            )
                            sd_op = jnp.zeros_like(cd)
                            any_rows = jnp.zeros_like(dist) > 0.0  # all-False
                            for i in range(DS):
                                fld = []
                                for f in range(8):
                                    fld.append(
                                        vsel(
                                            *[
                                                prof_s[pidxs[j] * (DS * 8) + i * 8 + f]
                                                for j in range(4)
                                            ]
                                        )
                                    )
                                s_from, s_to, e_from, e_to, mul = fld[:5]
                                in_range = (dist >= s_from) & (dist <= e_to)
                                basev = jnp.where(
                                    dist <= s_to,
                                    (dist - s_from) / (s_to - s_from),
                                    jnp.where(
                                        dist < e_from,
                                        1.0,
                                        (e_to - dist) / (e_to - e_from),
                                    ),
                                )
                                sd_op = jnp.fmax(
                                    sd_op, jnp.where(in_range, mul * basev, 0.0)
                                )
                                any_rows = any_rows | (s_from < jnp.float32(1e30))
                            sd_op = jnp.where(any_rows, sd_op, 1.0)
                            op_emit = jnp.fmin(sd_op, op)
                        else:
                            op_emit = op

                        n0 = (MN - mn0) * mn_i
                        m0 = (MX - mx0) * mx_i
                        A = two_mn * n0 + two_mx * m0 + (mx_d - 1)
                        T_band = _floor_div_f(A, two_mx_f, two_mx)
                        r_band = A - T_band * two_mx
                        edge_band = r_band == (two_mx - 1)

                        def alive_at(s_mn, s_mx):
                            s_x = jnp.where(swap, s_mx, s_mn)
                            s_y = jnp.where(swap, s_mn, s_mx)
                            raw_s = nc + sdy * s_x - sdx * s_y
                            cd_s = jnp.abs(raw_s.astype(jnp.float32)) * inv_denom
                            return (cd_s < feather_to) & om_pos

                        def step_up(k, c, rc, g, rg):
                            rc = rc + two_mn
                            carry = rc >= two_mx
                            rc = jnp.where(carry, rc - two_mx, rc)
                            rg2 = jnp.where(carry, rg + two_mn, rg)
                            gcarry = rg2 >= two_mx
                            rg2 = jnp.where(gcarry, rg2 - two_mx, rg2)
                            return (
                                k + 1,
                                jnp.where(carry, c + 1, c),
                                rc,
                                jnp.where(carry & gcarry, g + 1, g),
                                jnp.where(carry, rg2, rg),
                            )

                        def step_down(k, c, rc, g, rg):
                            rc = rc - two_mn
                            borrow = rc < 0
                            rc = jnp.where(borrow, rc + two_mx, rc)
                            rg2 = jnp.where(borrow, rg - two_mn, rg)
                            gborrow = rg2 < 0
                            rg2 = jnp.where(gborrow, rg2 + two_mx, rg2)
                            return (
                                k - 1,
                                jnp.where(borrow, c - 1, c),
                                rc,
                                jnp.where(borrow & gborrow, g - 1, g),
                                jnp.where(borrow, rg2, rg),
                            )

                        def invert(bc):
                            k = jnp.clip(
                                (bc.astype(jnp.float32) * ratio).astype(jnp.int32), 0, K
                            )
                            c, rc = _divmod_f(two_mn * k + mx_d - 1, two_mx_f, two_mx)
                            g, rg = _divmod_f(two_mn * c + mx_d - 1, two_mx_f, two_mx)
                            state = (k, c, rc, g, rg)
                            down = (state[0] > 0) & (state[0] + state[3] > bc)
                            nxt = step_down(*state)
                            state = tuple(
                                jnp.where(down, n, o) for n, o in zip(nxt, state)
                            )
                            nxt = step_up(*state)
                            up = (state[0] < K) & (nxt[0] + nxt[3] <= bc)
                            state = tuple(
                                jnp.where(up, n, o) for n, o in zip(nxt, state)
                            )
                            return state

                        def emit(add_mask):
                            alpha = jnp.where(add_mask, opacity * op_emit, 0.0)
                            if steep:
                                # slot j: row-pair j & 1, lane-half j >> 1.
                                for j in range(4):
                                    rlo = 16 * (j & 1)
                                    clo = 64 * (j >> 1)
                                    blk = alpha[rlo : rlo + 16, clo : clo + 64]
                                    sl = (
                                        pl.ds(r0s[j], RB16),
                                        slice(col0 + clo, col0 + clo + 64),
                                    )
                                    pending_ref[sl] = jnp.fmax(pending_ref[sl], blk)
                                return
                            for j in range(4):
                                blk = alpha[j * 8 : (j + 1) * 8, :]
                                cur = pending_ref[pl.ds(r0s[j], RB_I), col0 : col0 + 128]
                                pending_ref[pl.ds(r0s[j], RB_I), col0 : col0 + 128] = (
                                    jnp.fmax(cur, blk)
                                )

                        if mode in ("alive", "steep16"):
                            # Every walk start is provably alive (host
                            # _seg_all_alive), so aliveness never gates a
                            # pixel and ownership only decides band-edge
                            # pixels where exactly ONE of the two candidate
                            # bands is in range.  Those owners have closed
                            # forms — band 0's owner start is (mn0, mx0)
                            # itself (the A == -1 lower edge) and band hK's
                            # owner is the far endpoint mn0 + mn_i*mn_d —
                            # so the staircase invert() is not needed at
                            # all and the path costs ~the axis path.
                            in_slab_T = (A >= 0) & (T_band <= hK)
                            ok_edge = (
                                (in_slab_T & (T_band < hK))
                                | ((T_band == hK) & (n0 >= mn_d))
                                | ((A == -1) & (n0 <= 0))
                            )
                            emit(
                                in_line
                                & ((edge_band & ok_edge) | (~edge_band & in_slab_T))
                            )
                            return

                        # dead path: full dead-start machinery.
                        # The band-edge pixels' alternative owner (band
                        # T+1's backward branch) is folded into the main
                        # mask: alpha is owner-independent, so
                        # emit(ok_T | ok_N) == the two-pass fmax, one RMW
                        # cheaper and without an any()-reduce branch (edge
                        # columns occur in most short-segment groups).
                        bc = jnp.clip(T_band, 0, hK)
                        k, c, rc, g, rg = invert(bc)
                        h_k = k + g
                        is_gap = h_k != bc
                        c_sel = jnp.where(is_gap, c + 1, c)
                        s_mn_T = mn0 + mn_i * c_sel
                        s_mx_T = mx0 + mx_i * k
                        in_slab = (A >= 0) & (T_band <= hK)
                        dn_T = (MN - s_mn_T) * mn_i
                        ok_T = in_slab & alive_at(s_mn_T, s_mx_T)
                        ok_Tf = ok_T & ((~edge_band) | (dn_T >= 0))

                        bc2 = jnp.clip(T_band + 1, 0, hK)
                        nxt = step_up(k, c, rc, g, rg)
                        take2 = (k < K) & (nxt[0] + nxt[3] <= bc2)
                        k2 = jnp.where(take2, nxt[0], k)
                        c2 = jnp.where(take2, nxt[1], c)
                        g2 = jnp.where(take2, nxt[3], g)
                        is_gap2 = (k2 + g2) != bc2
                        c_sel2 = jnp.where(is_gap2, c2 + 1, c2)
                        s_mn_N = mn0 + mn_i * c_sel2
                        s_mx_N = mx0 + mx_i * k2
                        dn_N = (MN - s_mn_N) * mn_i
                        ok_N = (
                            edge_band
                            & (A + 1 >= 0)
                            & (T_band + 1 <= hK)
                            & (dn_N <= 0)
                            & alive_at(s_mn_N, s_mx_N)
                        )
                        emit(in_line & (ok_Tf | ok_N))

                    def do_section(slot, col0, mode):
                        if slot > 0:
                            start = isec_s[ch * NSEC + slot - 1]
                        else:
                            start = jnp.int32(0)
                        end = isec_s[ch * NSEC + slot]
                        n_grp = (end - start) >> 2

                        def grp(gidx, _):
                            eval_group(start + gidx * 4, col0, mode)
                            return 0

                        lax.fori_loop(0, n_grp, grp, 0)

                    for half in range(n_halves):
                        do_section(half, half * 128, "alive")
                        do_section(4 + half, half * 128, "steep16")
                        do_section(8 + half, half * 128, "dead")

                @pl.when(kind == KIND_STROKE)
                def _stroke():
                    stroke_impl(False)

                @pl.when(kind == KIND_STROKE_SOLID)
                def _stroke_solid():
                    stroke_items_impl(dashed=False)

                @pl.when(kind == KIND_STROKE_DASH)
                def _stroke_dash_items():
                    stroke_items_impl(dashed=True)

                # ------------------------- blend -------------------------
                @pl.when(last_s[ch] == 1)
                def _blend():
                    cr = color_r_s[ch]
                    cg = color_g_s[ch]
                    cb = color_b_s[ch]
                    p0 = prim_y0_s[ch]
                    pn = prim_nb_s[ch]

                    @pl.when(pat_s[ch] < 0)
                    def _blend_color():
                        def blend_block(b, _):
                            r0 = (p0 + b) * RB_F
                            a = pending_ref[pl.ds(r0, RB_F), :]
                            keep = 1.0 - a
                            acc_ref[0, pl.ds(r0, RB_F), :] = a * cr + keep * acc_ref[0, pl.ds(r0, RB_F), :]
                            acc_ref[1, pl.ds(r0, RB_F), :] = a * cg + keep * acc_ref[1, pl.ds(r0, RB_F), :]
                            acc_ref[2, pl.ds(r0, RB_F), :] = a * cb + keep * acc_ref[2, pl.ds(r0, RB_F), :]
                            acc_ref[3, pl.ds(r0, RB_F), :] = a + keep * acc_ref[3, pl.ds(r0, RB_F), :]
                            pending_ref[pl.ds(r0, RB_F), :] = jnp.zeros((RB_F, ts), jnp.float32)
                            return 0

                        lax.fori_loop(0, pn, blend_block, 0)

                    @pl.when((pat_s[ch] >= 0) & (kind == KIND_LAYER))
                    def _blend_layer():
                        # Host-rasterized premultiplied layer (oversize fills,
                        # computed exactly in f64 by ops/coverage_np.py): plain
                        # src-over of the pattern block, no pending mask.
                        def blend_block(b, _):
                            r0 = (p0 + b) * RB_F
                            pa = pat_ref[0, 3, pl.ds(r0, RB_F), :]
                            keep = 1.0 - pa
                            acc_ref[0, pl.ds(r0, RB_F), :] = (
                                pat_ref[0, 0, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[0, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[1, pl.ds(r0, RB_F), :] = (
                                pat_ref[0, 1, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[1, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[2, pl.ds(r0, RB_F), :] = (
                                pat_ref[0, 2, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[2, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[3, pl.ds(r0, RB_F), :] = (
                                pa + keep * acc_ref[3, pl.ds(r0, RB_F), :]
                            )
                            return 0

                        lax.fori_loop(0, pn, blend_block, 0)

                    @pl.when((pat_s[ch] >= 0) & (kind != KIND_LAYER))
                    def _blend_pattern():
                        # Tiled fill-image generation (fill.rs:36-40 semantics):
                        # the per-pixel source is the premultiplied icon sample;
                        # fill opacity is ignored, exactly like the reference.
                        def blend_block(b, _):
                            r0 = (p0 + b) * RB_F
                            mask = pending_ref[pl.ds(r0, RB_F), :]
                            pa = pat_ref[0, 3, pl.ds(r0, RB_F), :]
                            keep = 1.0 - mask * pa
                            acc_ref[0, pl.ds(r0, RB_F), :] = (
                                mask * pat_ref[0, 0, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[0, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[1, pl.ds(r0, RB_F), :] = (
                                mask * pat_ref[0, 1, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[1, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[2, pl.ds(r0, RB_F), :] = (
                                mask * pat_ref[0, 2, pl.ds(r0, RB_F), :]
                                + keep * acc_ref[2, pl.ds(r0, RB_F), :]
                            )
                            acc_ref[3, pl.ds(r0, RB_F), :] = (
                                mask * pa + keep * acc_ref[3, pl.ds(r0, RB_F), :]
                            )
                            pending_ref[pl.ds(r0, RB_F), :] = jnp.zeros((RB_F, ts), jnp.float32)
                            return 0

                        lax.fori_loop(0, pn, blend_block, 0)


            # On the tile's final chunk, finalize the f32 accumulator to
            # the u8 output block (same math the XLA epilogue used; doing
            # it in-kernel drops ~60 MB of f32 HBM round-trips per batch).
            @pl.when(tile_last_s[ch] == 1)
            def _finalize():
                def fin_block(fb, _):
                    r0 = fb * RB_F
                    a = acc_ref[3, pl.ds(r0, RB_F), :]
                    mul = jnp.where(a == 0.0, 0.0, 1.0 / a)
                    for c in range(3):
                        v = 255.0 * acc_ref[c, pl.ds(r0, RB_F), :] * mul
                        v = jnp.where(jnp.isnan(v), 0.0, jnp.clip(v, 0.0, 255.0))
                        # Mosaic has no f32->u8 cast; go through i32.
                        out_ref[0, c, pl.ds(r0, RB_F), :] = (
                            jnp.trunc(v).astype(jnp.int32).astype(jnp.uint8)
                        )
                    out_ref[0, 3, pl.ds(r0, RB_F), :] = jnp.full(
                        (RB_F, ts), 255, jnp.uint8
                    )
                    return 0

                lax.fori_loop(0, ts // RB_F, fin_block, 0)

            return 0

        if GROUP == 1:
            chunk_body(0, 0)  # no scalar loop around a single chunk
        else:
            lax.fori_loop(0, GROUP, chunk_body, 0)

    return kernel


@functools.lru_cache(maxsize=64)
def _render_jit(ts: int, T: int, interpret: bool):
    """One cached jitted callable per (tile size, batch tiles, interpret).

    The scalar-prefetch preamble, the pallas_call, and the planar u8
    output compile into ONE executable; shape changes (chunk-total /
    item-width buckets) retrace under jit and cache — buckets keep the
    signature count small.
    """
    kernel = make_render_kernel(ts)

    def run(b, canvas_rgb):
        return _render_body(kernel, b, canvas_rgb, ts, T, interpret)

    return jax.jit(run)


def render_batch_pallas(batch_arrays, canvas_rgb, ts: int, n_tiles: int, interpret: bool = False):
    """batch_arrays: PallasBatch (jnp leaves). -> (T, ts, ts, 3) uint8."""
    out = render_batch_pallas_planar(batch_arrays, canvas_rgb, ts, n_tiles, interpret)
    # Interleaved device-side view for compatibility; serving paths use
    # the planar output + host transpose (planar u8 reads back ~2x
    # faster over the tunnel than a (..., 3)-minor layout).
    return out[:, :3].transpose(0, 2, 3, 1)


def render_batch_pallas_planar(
    batch_arrays, canvas_rgb, ts: int, n_tiles: int, interpret: bool = False
):
    """-> (T, 4, ts, ts) uint8 (planar; channel 3 is dead padding)."""
    return _render_jit(ts, int(n_tiles), bool(interpret))(batch_arrays, canvas_rgb)


def planar_to_rgb(planar: np.ndarray) -> np.ndarray:
    """(T, 4, ts, ts) u8 host array -> contiguous (T, ts, ts, 3)."""
    return np.ascontiguousarray(planar[:, :3].transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Arena path (parallel/arena.py): warm serving uploads ONE small packed
# buffer per batch; the big per-chunk fields stay device-resident and the
# render jit assembles the batch with a row gather.
# ---------------------------------------------------------------------------

N_SMALL = 16 + NSEC  # i32 lanes in the packed small-field buffer


def pack_small_arena(
    tile_chunks: List[TileChunks], offsets: List[Tuple[int, int]]
) -> Tuple[np.ndarray, int]:
    """Host side of a warm batch: per-chunk scalars + arena gather rows
    packed into one (N_SMALL, C) i32 buffer.  Lane layout:

      0 tile_id  1 first  2 kind  3 cnt  4 last  5 y0  6 nb
      7 prim_y0  8 prim_nb  9 pat  10-12 color rgb (f32 bits)
      13 opacity (f32 bits)  14 hw (f32 bits)  15 gather row
      16.. isec (NSEC lanes)

    Returns (packed, IT) where IT is the batch's bucketed item width.
    Mirrors concat_pallas_batch's bucketing/padding exactly (pads:
    kind=KIND_PAD, pat=-1, tile_id=last tile, gather row 0 = the
    arena's reserved zero row)."""
    T = len(tile_chunks)
    counts = [c.kind.shape[0] for c in tile_chunks]
    total = sum(counts)
    assert all(c % GROUP == 0 for c in counts), (
        f"per-tile chunk counts not GROUP={GROUP}-aligned: {counts}"
    )
    Ctot = -(-next_bucket(max(total, 8), 8) // GROUP) * GROUP

    packed = np.zeros((N_SMALL, Ctot), np.int32)
    packed[9] = -1  # pat pad
    pos = 0
    for ti, (c, (off, n)) in enumerate(zip(tile_chunks, offsets)):
        e = pos + n
        packed[0, pos:e] = ti
        packed[1, pos] = 1
        packed[2, pos:e] = c.kind
        packed[3, pos:e] = c.cnt
        packed[4, pos:e] = c.last
        packed[5, pos:e] = c.y0
        packed[6, pos:e] = c.nb
        packed[7, pos:e] = c.prim_y0
        packed[8, pos:e] = c.prim_nb
        packed[9, pos:e] = c.pat
        packed[10:13, pos:e] = np.ascontiguousarray(
            c.color.astype(np.float32).T
        ).view(np.int32)
        packed[13, pos:e] = c.opacity.astype(np.float32).view(np.int32)
        packed[14, pos:e] = c.hw.astype(np.float32).view(np.int32)
        packed[15, pos:e] = np.arange(off, off + n, dtype=np.int32)
        packed[16:, pos:e] = c.isec.astype(np.int32).T
        pos = e
    if pos < Ctot:
        packed[0, pos:] = max(T - 1, 0)

    IT = max(c.items.shape[2] for c in tile_chunks)
    IT = max(256, 1 << (IT - 1).bit_length())
    return packed, IT


@functools.lru_cache(maxsize=128)
def _arena_render_jit(ts: int, T: int, IT: int, interpret: bool):
    kernel = make_render_kernel(ts)

    def run(packed, geomA, travA, sprofA, auxA, itemsA,
            prof_rows, prof_total, patterns, canvas_rgb):
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        idx = packed[15]
        color = jnp.stack([bc(packed[10]), bc(packed[11]), bc(packed[12])], axis=1)
        b = PallasBatch(
            geom=geomA[idx],
            traveled=travA[idx],
            seg_prof=sprofA[idx],
            seg_aux=auxA[idx],
            tile_id=packed[0], first=packed[1], kind=packed[2],
            cnt=packed[3], last=packed[4], y0=packed[5], nb=packed[6],
            prim_y0=packed[7], prim_nb=packed[8],
            color=color, opacity=bc(packed[13]), hw=bc(packed[14]),
            profiles=prof_rows, profile_total=prof_total,
            pat=packed[9], patterns=patterns,
            items=itemsA[idx, :, :IT],
            isec=packed[16:].T,
        )
        return _render_body(kernel, b, canvas_rgb, ts, T, interpret)

    return jax.jit(run)


def render_arena_planar(
    packed: np.ndarray, arena, prof_rows, prof_total, patterns,
    canvas_rgb, ts: int, n_tiles: int, IT: int, interpret: bool = False,
):
    """-> (T, 4, ts, ts) u8 planar, assembled on device from the arena.

    `packed` is the host buffer from pack_small_arena; its upload is
    the batch's only h2d transfer (prof/pattern/canvas arguments are
    expected to be already-resident device arrays)."""
    return _arena_render_jit(ts, int(n_tiles), int(IT), bool(interpret))(
        jnp.asarray(packed), arena.geom, arena.trav, arena.sprof,
        arena.aux, arena.items, prof_rows, prof_total, patterns,
        canvas_rgb,
    )


@functools.lru_cache(maxsize=128)
def _arena_render_label_jit(ts: int, T: int, IT: int, interpret: bool):
    """Arena render + fused device label blit: the combined upload is
    pack_small_arena's buffer with the compact (T, 3) (off, y0, n)
    slab-row triples appended (still ONE h2d transfer per warm batch —
    12 bytes/tile; the full row map expands on device), and the
    committed label layers blend over the planar u8 output inside the
    same jit — warm labeled serving does no host compositing
    (reference bar: labels are a minor fraction of tile time,
    drawer.rs:107-125)."""
    from osm_renderer_tpu.parallel.label_slab import blit_planar, expand_ltriples

    kernel = make_render_kernel(ts)

    def run(combined, geomA, travA, sprofA, auxA, itemsA,
            prof_rows, prof_total, patterns, canvas_rgb, label_plane):
        n_packed = combined.shape[0] - T * 3
        packed = combined[:n_packed].reshape(N_SMALL, -1)
        lrow = expand_ltriples(combined[n_packed:].reshape(T, 3), ts)
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        idx = packed[15]
        color = jnp.stack([bc(packed[10]), bc(packed[11]), bc(packed[12])], axis=1)
        b = PallasBatch(
            geom=geomA[idx],
            traveled=travA[idx],
            seg_prof=sprofA[idx],
            seg_aux=auxA[idx],
            tile_id=packed[0], first=packed[1], kind=packed[2],
            cnt=packed[3], last=packed[4], y0=packed[5], nb=packed[6],
            prim_y0=packed[7], prim_nb=packed[8],
            color=color, opacity=bc(packed[13]), hw=bc(packed[14]),
            profiles=prof_rows, profile_total=prof_total,
            pat=packed[9], patterns=patterns,
            items=itemsA[idx, :, :IT],
            isec=packed[16:].T,
        )
        out = _render_body(kernel, b, canvas_rgb, ts, T, interpret)
        return blit_planar(out, label_plane, lrow)

    return jax.jit(run)


def render_arena_planar_labeled(
    combined: np.ndarray, arena, prof_rows, prof_total, patterns,
    canvas_rgb, ts: int, n_tiles: int, IT: int, label_plane,
    interpret: bool = False,
):
    """render_arena_planar + device label blit; `combined` is the
    packed buffer with the slab-row map appended (one upload)."""
    return _arena_render_label_jit(ts, int(n_tiles), int(IT), bool(interpret))(
        jnp.asarray(combined), arena.geom, arena.trav, arena.sprof,
        arena.aux, arena.items, prof_rows, prof_total, patterns,
        canvas_rgb, label_plane,
    )




def _render_body(kernel, b, canvas_rgb, ts: int, T: int, interpret: bool):
    Ctot = b.kind.shape[0]

    prof_flat = b.profiles.reshape(-1).astype(jnp.float32)
    prof_total = b.profile_total.astype(jnp.float32)
    canvas = canvas_rgb.astype(jnp.float32)
    f32 = lambda a: a.astype(jnp.float32)

    # Grid steps process GROUP chunks each (concat_pallas_batch pads so
    # Ctot % GROUP == 0, no step straddles tiles, and at most one
    # pattern index occurs per step).
    assert Ctot % GROUP == 0, f"chunk total {Ctot} not a multiple of {GROUP}"
    n_steps = Ctot // GROUP
    step_tile = b.tile_id.reshape(n_steps, GROUP)[:, 0]
    step_pat = jnp.max(b.pat.reshape(n_steps, GROUP), axis=1)
    tile_last = jnp.concatenate(
        [
            (b.tile_id[1:] != b.tile_id[:-1]).astype(jnp.int32),
            jnp.ones((1,), jnp.int32),
        ]
    )
    kind_step = b.kind.reshape(n_steps, GROUP)
    is_dash_item = kind_step == KIND_STROKE_DASH
    is_span = kind_step == KIND_STROKE_SPAN
    step_dash = jnp.any(
        (kind_step == KIND_STROKE) | is_dash_item, axis=1
    ).astype(jnp.int32)
    # aux is read by every stroke flavor: per-segment scalars for the
    # item/segment paths, (a0, da) gradient lanes for span chunks.
    step_stroke = jnp.any(
        ((kind_step >= KIND_STROKE) & (kind_step <= KIND_STROKE_SOLID))
        | is_dash_item | is_span,
        axis=1,
    ).astype(jnp.int32)
    step_solid = jnp.any(
        (kind_step == KIND_STROKE_SOLID) | is_dash_item,
        axis=1,
    ).astype(jnp.int32)

    IT = b.items.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25,
        grid=(n_steps,),
        in_specs=[
            # Inputs a step's chunks never read keep their previous
            # block index (no DMA): trav/seg_prof stream only around
            # dashed chunks, aux around strokes, items around solid
            # strokes.  s[22..24] are the step_dash/stroke/solid masks.
            pl.BlockSpec((GROUP, 4, CH), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(
                (GROUP, 1, CH),
                lambda i, *s: (jnp.where(s[22][i] == 1, i, 0), 0, 0),
            ),
            pl.BlockSpec(
                (GROUP, 1, CH),
                lambda i, *s: (jnp.where(s[22][i] == 1, i, 0), 0, 0),
            ),
            pl.BlockSpec(
                (GROUP, 4, CH),
                lambda i, *s: (jnp.where(s[23][i] == 1, i, 0), 0, 0),
            ),
            # Fill-image pattern block, routed by the step's (unique)
            # pattern index (clamped: plain steps keep block 0 resident,
            # so the pipeline only refetches around icon-fill chunks).
            pl.BlockSpec(
                (1, 4, ts, ts),
                lambda i, *s: (jnp.maximum(s[19][i], 0), 0, 0, 0),
            ),
            pl.BlockSpec(
                (GROUP, 1, IT),
                lambda i, *s: (jnp.where(s[24][i] == 1, i, 0), 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, ts, ts), lambda i, *s: (s[18][i], 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((4, ts, ts), jnp.float32),
            pltpu.VMEM((ts, ts), jnp.float32),
            pltpu.SMEM((4, CH), jnp.int32),
            pltpu.SMEM((1, CH), jnp.float32),
            pltpu.SMEM((1, CH), jnp.int32),
            pltpu.SMEM((4, CH), jnp.float32),
            pltpu.SMEM((1, IT), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 4, ts, ts), jnp.uint8),
        interpret=interpret,
    )(
        b.tile_id, b.first, b.kind, b.cnt, b.last, b.y0, b.nb,
        b.prim_y0, b.prim_nb,
        f32(b.color[:, 0]), f32(b.color[:, 1]), f32(b.color[:, 2]),
        f32(b.opacity), f32(b.hw),
        prof_flat, prof_total, canvas, b.pat,
        step_tile, step_pat, tile_last, b.isec.reshape(-1),
        step_dash, step_stroke, step_solid,
        b.geom, b.traveled, b.seg_prof, b.seg_aux, b.patterns, b.items,
    )

    # Premultiply-divide + u8 happen in-kernel (_finalize); output stays
    # planar (readback-layout friendly) — interleave on host if needed.
    return out
