"""Equivalence of the invert-free "general-alive" item path.

The item kernel routes general (non-axis) stroke segments whose every
perpendicular-walk owner start is provably alive (`_seg_all_alive`)
onto a closed-form band test with no staircase inversion
(render_pallas.py eval_group mode "alive").  This test pins the claim
behind that routing: on all-alive segments, the alive formula visits
exactly the same pixel set as the full dead-start machinery (mode
"dead"), owner semantics computed from first principles here rather
than transcribed from the kernel's incremental invert().

Reference semantics under test: the perpendicular-walk pixel set of
line.rs:65-141 with the feather aliveness rule of
opacity_calculator.rs:171-185 (via this repo's band-ownership
reformulation, docs/DESIGN.md section 3).
"""

import numpy as np

from osm_renderer_tpu.ops.render_pallas import _seg_all_alive


def _band_fields(x1, y1, x2, y2):
    dx, dy = abs(x2 - x1), abs(y2 - y1)
    swap = dx > dy
    mn0, mx0 = (y1, x1) if swap else (x1, y1)
    mn_d, mx_d = (dy, dx) if swap else (dx, dy)
    mx_d = max(mx_d, 1)
    x_inc = 1 if x1 <= x2 else -1
    y_inc = 1 if y1 <= y2 else -1
    mn_i, mx_i = (y_inc, x_inc) if swap else (x_inc, y_inc)
    return swap, mn0, mx0, mn_d, mx_d, mn_i, mx_i


def _owner(bc, mn, mx):
    """Owner walk start of band `bc`: the largest k with h(k) <= bc;
    gap bands get the skip start (c(k)+1, k)."""
    ks = np.arange(mx + 1)
    c = (2 * ks * mn + mx - 1) // (2 * mx)
    g = (2 * c * mn + mx - 1) // (2 * mx)
    h = ks + g
    k = int(np.searchsorted(h, bc, side="right")) - 1
    is_gap = h[k] != bc
    c_sel = int(c[k]) + (1 if is_gap else 0)
    return k, c_sel


def _visited_masks(x1, y1, x2, y2, hw, lo, hi):
    """(alive_mask, dead_mask) over the [lo, hi)^2 window."""
    swap, mn0, mx0, mn_d, mx_d, mn_i, mx_i = _band_fields(x1, y1, x2, y2)
    den = float(np.hypot(x2 - x1, y2 - y1))
    feather_from = max(hw - 0.5, 0.0)
    feather_to = max(hw + 0.5, 1.0)
    om_pos = min(2.0 * hw, 1.0) > 0.0
    nc = x2 * y1 - y2 * x1
    sdx, sdy = x2 - x1, y2 - y1
    cK = (2 * mx_d * mn_d + mx_d - 1) // (2 * mx_d)
    gK = (2 * cK * mn_d + mx_d - 1) // (2 * mx_d)
    hK = mx_d + gK
    two_mx, two_mn = 2 * mx_d, 2 * mn_d

    def alive_at(c_sel, k):
        s_mn = mn0 + mn_i * c_sel
        s_mx = mx0 + mx_i * k
        sx, sy = (s_mx, s_mn) if swap else (s_mn, s_mx)
        cd = abs(nc + sdy * sx - sdx * sy) / den
        return (cd < feather_to) and om_pos

    n = hi - lo
    alive_m = np.zeros((n, n), bool)
    dead_m = np.zeros((n, n), bool)
    for yy in range(lo, hi):
        for xx in range(lo, hi):
            cd = abs(nc + sdy * xx - sdx * yy) / den
            in_line = cd < feather_to and om_pos
            if not in_line and feather_to > feather_from:
                continue
            MN, MX = (yy, xx) if swap else (xx, yy)
            n0 = (MN - mn0) * mn_i
            m0 = (MX - mx0) * mx_i
            A = two_mn * n0 + two_mx * m0 + (mx_d - 1)
            T = A // two_mx
            edge = (A - T * two_mx) == (two_mx - 1)

            in_slab_T = A >= 0 and T <= hK
            if edge:
                ok_a = (
                    (in_slab_T and T < hK)
                    or (T == hK and n0 >= mn_d)
                    or (A == -1 and n0 <= 0)
                )
            else:
                ok_a = in_slab_T
            alive_m[yy - lo, xx - lo] = in_line and ok_a

            ok_d = False
            if in_slab_T:
                k, c_sel = _owner(int(T), mn_d, mx_d)
                dn_T = n0 - c_sel
                ok_d |= alive_at(c_sel, k) and ((not edge) or dn_T >= 0)
            if edge and A + 1 >= 0 and T + 1 <= hK:
                k2, c_sel2 = _owner(int(T) + 1, mn_d, mx_d)
                dn_N = n0 - c_sel2
                ok_d |= dn_N <= 0 and alive_at(c_sel2, k2)
            dead_m[yy - lo, xx - lo] = in_line and ok_d
    return alive_m, dead_m


def test_alive_formula_matches_dead_machinery():
    rng = np.random.default_rng(11)
    n_alive = 0
    for trial in range(400):
        span = int(rng.integers(1, 40))
        x1, y1 = (int(v) for v in rng.integers(-8, 48, 2))
        x2 = x1 + int(rng.integers(-span, span + 1))
        y2 = y1 + int(rng.integers(-span, span + 1))
        if x1 == x2 or y1 == y2:
            continue  # axis path, not under test
        hw = float(rng.choice([0.25, 0.5, 0.75, 1.0, 1.25, 2.5, 4.0]))
        g = np.array([[x1, y1, x2, y2]], np.int64)
        if not bool(_seg_all_alive(g, hw)[0]):
            continue
        n_alive += 1
        m = int(np.ceil(hw)) + 2
        lo = min(x1, x2, y1, y2) - m
        hi = max(x1, x2, y1, y2) + m + 1
        alive_m, dead_m = _visited_masks(x1, y1, x2, y2, hw, lo, hi)
        assert (alive_m == dead_m).all(), (
            f"alive/dead mismatch seg=({x1},{y1})-({x2},{y2}) hw={hw}"
        )
    # the routing only pays off if most segments classify alive
    assert n_alive > 150


def test_dead_classification_finds_real_dead_starts():
    """Segments the classifier routes to the dead path for a reason
    other than conservatism must truly have a dead owner start (the
    classifier is allowed to be conservative, but if it were *always*
    conservative the alive path would be dead code)."""
    rng = np.random.default_rng(7)
    n_dead = n_true = 0
    for _ in range(600):
        x1, y1 = (int(v) for v in rng.integers(0, 30, 2))
        x2 = x1 + int(rng.integers(-30, 31))
        y2 = y1 + int(rng.integers(-30, 31))
        if x1 == x2 or y1 == y2:
            continue
        hw = float(rng.choice([0.25, 0.5, 0.75]))
        g = np.array([[x1, y1, x2, y2]], np.int64)
        if bool(_seg_all_alive(g, hw)[0]):
            continue
        n_dead += 1
        # brute-force: does a dead owner start actually exist?
        swap, mn0, mx0, mn_d, mx_d, mn_i, mx_i = _band_fields(x1, y1, x2, y2)
        den = float(np.hypot(x2 - x1, y2 - y1))
        feather_to = max(hw + 0.5, 1.0)
        nc = x2 * y1 - y2 * x1
        sdx, sdy = x2 - x1, y2 - y1
        ks = np.arange(mx_d + 1)
        c = (2 * ks * mn_d + mx_d - 1) // (2 * mx_d)
        g_ = (2 * c * mn_d + mx_d - 1) // (2 * mx_d)
        h = ks + g_
        gap = (h[1:] - h[:-1]) == 2
        found_dead = False
        for k in ks[:-1][gap]:
            c_sel = int(c[k]) + 1
            s_mn = mn0 + mn_i * c_sel
            s_mx = mx0 + mx_i * int(k)
            sx, sy = (s_mx, s_mn) if swap else (s_mn, s_mx)
            cd = abs(nc + sdy * sx - sdx * sy) / den
            if not (cd < feather_to - 1e-6):
                found_dead = True
        if found_dead:
            n_true += 1
    if n_dead:
        # nearly all dead-routed segments have a genuinely dead start
        # (the 1e-6 epsilon band is the only allowed conservatism)
        assert n_true >= n_dead * 0.9


def test_item_windows_cover_visited_pixels():
    """Item-window safety: every pixel the walk/ownership model can
    paint must lie inside some emitted (8-row block, column-half)
    window — the per-half y-clipped emission (_seg_half_blocks) must
    never drop a window the kernel would have painted in."""
    from osm_renderer_tpu.ops.render_pallas import _stroke_items, RB16, RB_I

    ts = 256
    rng = np.random.default_rng(23)
    checked = 0
    for trial in range(300):
        span = int(rng.integers(1, 220))
        x1, y1 = (int(v) for v in rng.integers(-40, ts + 40, 2))
        x2 = x1 + int(rng.integers(-span, span + 1))
        y2 = y1 + int(rng.integers(-span, span + 1))
        if x1 == x2 and y1 == y2:
            continue
        hw = float(rng.choice([0.25, 0.5, 1.0, 2.5, 4.0, 7.5]))
        g = np.array([[x1, y1, x2, y2]], np.int64)
        items, isec = _stroke_items(g, hw, ts)

        covered = np.zeros((ts, ts), dtype=bool)
        start = 0
        for slot in range(12):
            end = int(isec[slot])
            h = slot % 4
            c0 = h * 128
            steep_sec = 4 <= slot < 8
            for w in items[start:end]:
                if steep_sec:
                    # (16, 64) windows; bit 14 is the 64-col sub-half
                    r0 = ((int(w) >> 8) & 63) * RB16
                    cs = c0 + 64 * ((int(w) >> 14) & 1)
                    covered[r0 : r0 + RB16, cs : cs + 64] = True
                else:
                    r0 = ((int(w) >> 8) & 63) * RB_I
                    covered[r0 : r0 + RB_I, c0 : c0 + 128] = True
            start = end

        m = int(np.ceil(hw)) + 2
        lo = min(x1, x2, y1, y2) - m
        hi = max(x1, x2, y1, y2) + m + 1
        _, dead_m = _visited_masks(x1, y1, x2, y2, hw, lo, hi)
        ys, xs = np.nonzero(dead_m)
        ys = ys + lo
        xs = xs + lo
        inside = (ys >= 0) & (ys < ts) & (xs >= 0) & (xs < ts)
        ys, xs = ys[inside], xs[inside]
        if ys.size == 0:
            continue
        checked += 1
        missing = ~covered[ys, xs]
        assert not missing.any(), (
            f"seg=({x1},{y1})-({x2},{y2}) hw={hw}: "
            f"{int(missing.sum())} visited pixels outside item windows, "
            f"e.g. {list(zip(ys[missing][:3], xs[missing][:3]))}"
        )
    assert checked > 120
