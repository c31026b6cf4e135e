"""Jitted batch tile renderer (pure JAX).

Renders a batch of tiles from a host-assembled, statically-shaped
"chunk stream" (see `osm_renderer_tpu.draw.primitives`): a paint-ordered
list of draw chunks per tile, each referencing a slice of a shared
geometry array.  Coverage math is the closed-form dense model validated
against the C++ oracle in `ops/coverage_np.py`; compositing is the
reference's per-primitive max-alpha + src-over semantics expressed as a
`lax.scan` over chunks.

This module is the *exact* (f64/int64) flavor — it requires
`jax_enable_x64` and is bit-compatible with the numpy reference; the
TPU-optimized f32 Pallas kernel lives in `ops/render_pallas.py` and is
validated against this one.

Array layout per tile (leading batch dim T):
  geom         (G, 4) int32   point pairs (strokes) / contour edges (fills)
  geom_traveled(G,)   f32     arc length before each stroke segment
  geom_profile (G,)   int32   dash-profile index per stroke segment
  chunk_kind   (C,)   int32   0 = pad, 1 = fill, 2 = stroke
  chunk_off/cnt(C,)   int32   slice into geom (cnt <= CHUNK)
  chunk_last   (C,)   bool    last chunk of its primitive -> blend
  chunk_color  (C, 3) f32     color / 255
  chunk_opacity(C,)   f32     fill-opacity / stroke opacity
  chunk_hw     (C,)   f32     stroke half-width
Shared per batch:
  profiles     (NP, DS, 8) f32   dash profiles (see DashProfile)
  profile_total(NP,)       f32
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_SUB = 8  # inner vectorization width over edges/segments

KIND_PAD = 0
KIND_FILL = 1
KIND_STROKE = 2
KIND_FILL_IMAGE = 5  # tiled fill-image (pattern-sourced generation)


class TileBatch(NamedTuple):
    geom: jax.Array          # (T, G, 4) int32
    geom_traveled: jax.Array  # (T, G) f32/f64
    geom_profile: jax.Array  # (T, G) int32
    chunk_kind: jax.Array    # (T, C) int32
    chunk_off: jax.Array     # (T, C) int32
    chunk_cnt: jax.Array     # (T, C) int32
    chunk_last: jax.Array    # (T, C) bool
    chunk_color: jax.Array   # (T, C, 3) float
    chunk_opacity: jax.Array  # (T, C) float
    chunk_hw: jax.Array      # (T, C) float
    profiles: jax.Array      # (NP, DS, 8) float
    profile_total: jax.Array  # (NP,) float
    chunk_pat: jax.Array     # (T, C) int32  fill-image index, -1 = none
    patterns: jax.Array      # (NPat, ts, ts, 4) float premultiplied tiled icons


def _require_x64():
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError(
            "render_jnp requires jax_enable_x64 (exact integer closed forms); "
            "use the Pallas f32 path for production TPU serving"
        )


# --------------------------------------------------------------------------
# Stroke coverage (dense ownership model; see coverage_np.stroke_segment_alpha)
# --------------------------------------------------------------------------


def _floor_div(u, v, fi, ff):
    """Exact floor division.

    On the fast int32 path, vector integer division lowers to a very
    expensive expansion on TPU; use a float-reciprocal estimate plus
    exact integer residual corrections instead (valid for |u| < 2^30,
    0 < v < 2^24 — guaranteed by the fast-path coordinate bound).
    """
    if fi == jnp.int64:
        return u // v
    q = jnp.floor(u.astype(ff) / v.astype(ff)).astype(fi)
    r = u - q * v
    q = jnp.where(r < 0, q - 1, q)
    r = u - q * v
    q = jnp.where(r < 0, q - 1, q)
    r = u - q * v
    q = jnp.where(r >= v, q + 1, q)
    r = u - q * v
    q = jnp.where(r >= v, q + 1, q)
    return q


def _ceil_div2(a, b, fi, ff):
    return -_floor_div(-a, b, fi, ff)


def _opacity_by_center_distance(cd, hlw):
    feather_from = jnp.fmax(hlw - 0.5, 0.0)
    feather_to = jnp.fmax(hlw + 0.5, 1.0)
    feather_dist = feather_to - feather_from
    opacity_mul = jnp.fmin(2.0 * hlw, 1.0)
    v = jnp.where(
        cd < feather_from,
        1.0,
        jnp.where(cd < feather_to, (feather_to - cd) / feather_dist, 0.0),
    )
    return opacity_mul * v


def _stroke_opacity(cd, start_dist, half_width, prof, prof_total, traveled):
    """prof: (DS, 8); cd/start_dist arrays. Returns (opacity, in_line).

    The dash-profile reduction is unrolled as a loop over the (few,
    statically-shaped) profile rows using only 2D arrays — trailing
    non-128-aligned broadcast dims compile pathologically on TPU.
    """
    dist_rem = traveled + start_dist
    d = jnp.where(prof_total > 0.0, jnp.fmod(dist_rem, prof_total), dist_rem)

    sd_op = jnp.zeros_like(d)
    cap_dist = jnp.full_like(d, jnp.inf)
    any_rows = False
    for i in range(prof.shape[0]):
        s_from, s_to = prof[i, 0], prof[i, 1]
        e_from, e_to = prof[i, 2], prof[i, 3]
        mul, has_orig = prof[i, 4], prof[i, 5]
        orig_a, orig_b = prof[i, 6], prof[i, 7]
        in_range = (d >= s_from) & (d <= e_to)
        base = jnp.where(
            d <= s_to,
            (d - s_from) / (s_to - s_from),
            jnp.where(d < e_from, 1.0, (e_to - d) / (e_to - e_from)),
        )
        sd_op = jnp.fmax(sd_op, jnp.where(in_range, mul * base, 0.0))
        cap_d = jnp.where(
            d < orig_a, orig_a - d, jnp.where(d <= orig_b, 0.0, d - orig_b)
        )
        cap_dist = jnp.fmin(
            cap_dist, jnp.where(in_range & (has_orig > 0.0), cap_d, jnp.inf)
        )
        any_rows = jnp.logical_or(any_rows, s_from < jnp.inf)
    # Empty profile (all rows disabled): plain opacity 1, no cap shrink.
    sd_op = jnp.where(any_rows, sd_op, 1.0)
    cap_dist = jnp.where(jnp.isinf(cap_dist), 0.0, cap_dist)

    hlw = jnp.sqrt(half_width * half_width - cap_dist * cap_dist)
    cd_op = _opacity_by_center_distance(cd, hlw)
    return jnp.fmin(sd_op, cd_op), cd_op > 0.0


def _stroke_segment_alpha(seg, hw, opacity, prof, prof_total, traveled, xs, ys, fi, ff, chain=False):
    """Alpha field of one stroke segment over the (ts, ts) grid.

    seg: (4,) int; xs: (1, ts); ys: (ts, 1); fi/ff: int/float dtypes.
    """
    p1x, p1y, p2x, p2y = seg[0], seg[1], seg[2], seg[3]
    degenerate = (p1x == p2x) & (p1y == p2y)

    dx = jnp.abs(p2x - p1x)
    dy = jnp.abs(p2y - p1y)
    swap = dx > dy
    mn0 = jnp.where(swap, p1y, p1x)
    mx0 = jnp.where(swap, p1x, p1y)
    mn_d = jnp.where(swap, dy, dx)
    mx_d = jnp.where(swap, dx, dy)
    mx_d = jnp.maximum(mx_d, 1)  # degenerate guard (masked out at the end)
    x_inc = jnp.where(p1x <= p2x, 1, -1)
    y_inc = jnp.where(p1y <= p2y, 1, -1)
    mn_i = jnp.where(swap, y_inc, x_inc)
    mx_i = jnp.where(swap, x_inc, y_inc)

    numer_const = p2x * p1y - p2y * p1x
    sdx, sdy = p2x - p1x, p2y - p1y
    denom = jnp.sqrt((dx * dx + dy * dy).astype(ff))
    raw = numer_const + sdy * xs - sdx * ys
    cd = jnp.abs(raw.astype(ff)) / denom
    if ff == jnp.float64:
        # Exact path: replicate the reference's rounding chain
        # (line.rs:120-121) bit-for-bit.
        dxp = (xs - p1x).astype(ff)
        dyp = (ys - p1y).astype(ff)
        long_d = jnp.sqrt(dxp * dxp + dyp * dyp)
        start_dist = jnp.sqrt(jnp.fmax(long_d * long_d - cd * cd, 0.0))
    else:
        # f32 path: the chain loses ~0.05 px at long distances; use the
        # mathematically equal |(p - p1) . d| / |d| with an exact int32
        # dot product (safe under the coordinate bound).
        dot = (xs - p1x) * sdx + (ys - p1y) * sdy
        start_dist = jnp.abs(dot.astype(ff)) / denom

    op, in_line = _stroke_opacity(cd, start_dist, hw, prof, prof_total, traveled)

    MN = jnp.where(swap, ys, xs)
    MX = jnp.where(swap, xs, ys)
    n0 = (MN - mn0) * mn_i
    m0 = (MX - mx0) * mx_i
    two_mx = 2 * mx_d
    A = 2 * mn_d * n0 + two_mx * m0 + (mx_d - 1)
    T = _floor_div(A, two_mx, fi, ff)
    r = A - T * two_mx
    edge_band = r == two_mx - 1

    def c_of(k):
        return _floor_div(2 * k * mn_d + mx_d - 1, two_mx, fi, ff)

    def h_of(k):
        return k + _floor_div(2 * c_of(k) * mn_d + mx_d - 1, two_mx, fi, ff)

    K = mx_d
    hK = h_of(K)

    def band_start(b):
        bc = jnp.clip(b, 0, hK)
        ratio = (mx_d * mx_d).astype(ff) / (mx_d * mx_d + mn_d * mn_d).astype(ff)
        k = (bc.astype(ff) * ratio).astype(fi)
        k = jnp.clip(k, 0, K)
        for _ in range(6):
            k = jnp.where((k > 0) & (h_of(k) > bc), k - 1, k)
        for _ in range(6):
            k = jnp.where((k < K) & (h_of(k + 1) <= bc), k + 1, k)
        is_gap = h_of(k) != bc
        c_sel = jnp.where(is_gap, c_of(k + 1), c_of(k))
        return mn0 + mn_i * c_sel, mx0 + mx_i * k, c_sel

    def start_alive(s_mn, s_mx):
        s_x = jnp.where(swap, s_mx, s_mn)
        s_y = jnp.where(swap, s_mn, s_mx)
        raw_s = numer_const + sdy * s_x - sdx * s_y
        cd_s = jnp.abs(raw_s.astype(ff)) / denom
        if ff == jnp.float64:
            dxs = (s_x - p1x).astype(ff)
            dys = (s_y - p1y).astype(ff)
            long_s = jnp.sqrt(dxs * dxs + dys * dys)
            sd_s = jnp.sqrt(jnp.fmax(long_s * long_s - cd_s * cd_s, 0.0))
        else:
            dot_s = (s_x - p1x) * sdx + (s_y - p1y) * sdy
            sd_s = jnp.abs(dot_s.astype(ff)) / denom
        _, alive = _stroke_opacity(cd_s, sd_s, hw, prof, prof_total, traveled)
        return alive

    in_slab = (A >= 0) & (T <= hK)
    s_mn_T, s_mx_T, c_sel_T = band_start(T)
    ok_T = in_slab & start_alive(s_mn_T, s_mx_T)

    s_mn_N, s_mx_N, c_sel_N = band_start(T + 1)
    dn_T = (MN - s_mn_T) * mn_i
    dn_N = (MN - s_mn_N) * mn_i

    if chain:
        # Walk-chain rule for round-capped dashes: every intermediate
        # perpendicular pixel must be in-line too (see coverage_np.py
        # for the validated closed forms).
        any_orig = jnp.any((prof[:, 0] < 1e30) & (prof[:, 5] > 0))

        def ceil_div(a, b):
            return _floor_div(a + b - 1, b, fi, ff)

        def chain_alive(s_mn_v, s_mx_v, c_sel_v, mul_v, jv):
            tcm = 2 * c_sel_v * mn_d
            G = jnp.maximum(0, ceil_div(tcm - mx_d, two_mx))
            e0 = mul_v * (tcm - two_mx * G)
            ok = jnp.ones_like(jv, dtype=bool)
            for jp in range(1, 12):
                Cjp = jnp.maximum(0, ceil_div(e0 + 2 * jp * mn_d - mx_d, two_mx))
                minor = s_mn_v + mul_v * mn_i * jp
                major = s_mx_v - mul_v * mx_i * Cjp
                ok = ok & (start_alive(minor, major) | (jp >= jv))
            return ok

        mul_T = jnp.where(dn_T >= 0, 1, -1).astype(fi)
        ok_T = ok_T & (
            ~any_orig | chain_alive(s_mn_T, s_mx_T, c_sel_T, mul_T, jnp.abs(dn_T))
        )
        chain_N = ~any_orig | chain_alive(
            s_mn_N, s_mx_N, c_sel_N, jnp.asarray(-1, fi), -dn_N
        )
    else:
        chain_N = True

    ok_T = ok_T & jnp.where(edge_band, dn_T >= 0, True)
    ok_N = (
        edge_band
        & (A + 1 >= 0)
        & (T + 1 <= hK)
        & (dn_N <= 0)
        & start_alive(s_mn_N, s_mx_N)
        & chain_N
    )
    visited = in_line & (ok_T | ok_N) & ~degenerate
    return jnp.where(visited, opacity * op, 0.0)


# --------------------------------------------------------------------------
# Fill coverage (dense parity/b-extension model; see coverage_np.fill_alpha)
# --------------------------------------------------------------------------

def _ceil_div(a, b):
    return -((-a) // b)


def _fill_chunk_alpha(geom, mask, fill_opacity, ts: int, fi, ff):
    """geom: (CHUNK, 4) int edges; mask: (CHUNK,) valid. -> (ts, ts) alpha."""
    x1 = geom[:, 0][:, None]
    y1 = geom[:, 1][:, None]
    x2 = geom[:, 2][:, None]
    y2 = geom[:, 3][:, None]
    rows = jnp.arange(ts, dtype=fi)[None, :]

    adx = jnp.abs(x2 - x1)
    ady = jnp.abs(y2 - y1)
    sx = jnp.where(x1 < x2, 1, -1)
    sy = jnp.where(y1 < y2, 1, -1)

    ytop = jnp.minimum(y1, y2)
    ybot = jnp.maximum(y1, y2)
    active = (rows > ytop) & (rows <= ybot) & mask[:, None]

    j = jnp.abs(rows - y1)

    steep_x = x1 + sx * _floor_div(2 * j * adx + ady, jnp.maximum(2 * ady, 1), fi, ff)

    ady_nz = jnp.maximum(ady, 1)
    i_min = jnp.clip(_ceil_div2(adx * (2 * j - 1), 2 * ady_nz, fi, ff), 0, adx)
    i_max = jnp.clip(_ceil_div2(adx * (2 * j + 1), 2 * ady_nz, fi, ff) - 1, 0, adx)
    sh_lo = x1 + sx * i_min
    sh_hi = x1 + sx * i_max
    sh_a = jnp.minimum(sh_lo, sh_hi)
    sh_b = jnp.maximum(sh_lo, sh_hi)

    steep = ady > adx
    a = jnp.where(steep, steep_x, sh_a)
    b = jnp.where(steep, steep_x, sh_b)

    # Stable rank within each row by (a, edge index).
    big = fi(2**60 if fi == jnp.int64 else 2**30)
    a_masked = jnp.where(active, a, big)
    order = jnp.argsort(a_masked, axis=0, stable=True)
    rank = jnp.zeros_like(order).at[
        order, jnp.broadcast_to(rows, order.shape)
    ].set(jnp.broadcast_to(jnp.arange(order.shape[0], dtype=order.dtype)[:, None], order.shape))
    odd_rank = active & ((rank & 1) == 1)

    n_active = active.sum(axis=0, dtype=jnp.int32)  # (ts,)

    xs = jnp.arange(ts, dtype=fi)[None, None, :]

    def body(i, carry):
        N, tail = carry
        sl = lambda arr: lax.dynamic_slice_in_dim(arr, i * _SUB, _SUB, axis=0)
        a_s, b_s = sl(a)[:, :, None], sl(b)[:, :, None]
        act_s = sl(active)[:, :, None]
        odd_s = sl(odd_rank)[:, :, None]
        N = N + (act_s & (a_s <= xs)).sum(axis=0, dtype=jnp.int32)
        tail = tail | (odd_s & (a_s <= xs) & (xs <= b_s)).any(axis=0)
        return N, tail

    N0 = jnp.zeros((ts, ts), dtype=jnp.int32)
    tail0 = jnp.zeros((ts, ts), dtype=bool)
    N, tail = lax.fori_loop(0, geom.shape[0] // _SUB, body, (N0, tail0))

    parity = ((N & 1) == 1) & ~(
        (N == n_active[:, None]) & ((n_active[:, None] & 1) == 1)
    )
    filled = parity | tail
    return jnp.where(filled, fill_opacity, 0.0)


def _stroke_chunk_alpha(
    geom, traveled, prof_idx, mask, hw, opacity, profiles, profile_total, ts: int, fi, ff,
    chain=False,
):
    xs = jnp.arange(ts, dtype=fi)[None, :]
    ys = jnp.arange(ts, dtype=fi)[:, None]

    def seg_alpha(seg, trav, pidx, m):
        alpha = _stroke_segment_alpha(
            seg, hw, opacity, profiles[pidx], profile_total[pidx], trav, xs, ys, fi, ff,
            chain,
        )
        return jnp.where(m, alpha, 0.0)

    def body(i, acc):
        sl = lambda arr: lax.dynamic_slice_in_dim(arr, i * _SUB, _SUB, axis=0)
        alphas = jax.vmap(seg_alpha)(sl(geom), sl(traveled), sl(prof_idx), sl(mask))
        return jnp.fmax(acc, alphas.max(axis=0))

    acc0 = jnp.zeros((ts, ts), dtype=profiles.dtype)
    return lax.fori_loop(0, geom.shape[0] // _SUB, body, acc0)


# --------------------------------------------------------------------------
# Chunk-scan compositor
# --------------------------------------------------------------------------

def _render_one_tile(batch: TileBatch, tile_idx, canvas_rgb, ts: int, chunk: int, fi, ff, chain=False):
    geom = batch.geom[tile_idx].astype(fi)
    traveled = batch.geom_traveled[tile_idx]
    gprof = batch.geom_profile[tile_idx]

    C0 = jnp.concatenate(
        [
            jnp.broadcast_to(canvas_rgb, (ts, ts, 3)),
            jnp.ones((ts, ts, 1), dtype=canvas_rgb.dtype),
        ],
        axis=-1,
    )
    pending0 = jnp.zeros((ts, ts), dtype=canvas_rgb.dtype)

    idxs = jnp.arange(chunk, dtype=jnp.int32)

    def step(carry, ch):
        C, pending = carry
        kind, off, cnt, last, color, op, hw, pat = ch
        sl = lambda arr: lax.dynamic_slice_in_dim(arr, off, chunk, axis=0)
        g = sl(geom)
        mask = idxs < cnt

        def fill_branch():
            return _fill_chunk_alpha(g, mask, op, ts, fi, ff)

        def stroke_branch():
            return _stroke_chunk_alpha(
                g, sl(traveled), sl(gprof), mask, hw, op,
                batch.profiles, batch.profile_total, ts, fi, ff, chain,
            )

        def pad_branch():
            return jnp.zeros((ts, ts), dtype=C.dtype)

        # kind 5 (fill-image) rasterizes the same mask as a plain fill
        # (host sets opacity 1); the source colors come from the pattern
        # at blend time.
        alpha = lax.switch(
            jnp.clip(kind, 0, 3),
            [pad_branch, fill_branch, stroke_branch, fill_branch],
        )
        pending = jnp.fmax(pending, alpha)

        def do_blend(args):
            C, pending = args

            def color_blend(_):
                a = pending[..., None]
                src = jnp.concatenate(
                    [color * pending[..., None], pending[..., None]], axis=-1
                )
                return src + (1.0 - a) * C

            def pattern_blend(_):
                # fill.rs:36-40 semantics: per-pixel premultiplied icon
                # sample, fill opacity ignored.
                tile_pat = lax.dynamic_index_in_dim(
                    batch.patterns, jnp.maximum(pat, 0), axis=0, keepdims=False
                )
                m = pending[..., None]
                a_eff = m * tile_pat[..., 3:4]
                return m * tile_pat + (1.0 - a_eff) * C

            newC = lax.cond(pat >= 0, pattern_blend, color_blend, None)
            return newC, jnp.zeros_like(pending)

        C, pending = lax.cond(last, do_blend, lambda args: args, (C, pending))
        return (C, pending), None

    chunks = (
        batch.chunk_kind[tile_idx],
        batch.chunk_off[tile_idx],
        batch.chunk_cnt[tile_idx],
        batch.chunk_last[tile_idx],
        batch.chunk_color[tile_idx],
        batch.chunk_opacity[tile_idx],
        batch.chunk_hw[tile_idx],
        batch.chunk_pat[tile_idx],
    )
    (C, _), _ = lax.scan(step, (C0, pending0), chunks)
    return C


def _finalize_rgb(C):
    a = C[..., 3]
    mul = jnp.where(a == 0.0, 0.0, 1.0 / a)
    v = 255.0 * C[..., :3] * mul[..., None]
    v = jnp.where(jnp.isnan(v), 0.0, jnp.clip(v, 0.0, 255.0))
    return jnp.trunc(v).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("ts", "chunk", "precision", "chain"))
def render_batch(batch: TileBatch, canvas_rgb, ts: int, chunk: int = 64, precision: str = "exact", chain: bool = False):
    """Render all tiles in the batch -> (T, ts, ts, 3) uint8.

    precision="exact": int64/f64 closed forms (requires jax_enable_x64),
    bit-compatible with the CPU oracle on any geometry.
    precision="fast": int32/f32 — exact integer membership provided all
    tile-relative coordinates satisfy |c| < 2^14 (the host assembly
    checks this); opacity within 1/255 of the oracle.  This is the
    native TPU flavor.
    """
    if precision == "exact":
        _require_x64()
        fi, ff = jnp.int64, jnp.float64
    else:
        fi, ff = jnp.int32, jnp.float32
    T = batch.geom.shape[0]

    def one(i):
        return _finalize_rgb(_render_one_tile(batch, i, canvas_rgb, ts, chunk, fi, ff, chain))

    return jax.vmap(one)(jnp.arange(T))
