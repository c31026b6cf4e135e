"""Executable spec of the reference's stroke rasterizer (test-only).

A literal Python transcription of the reference's Murphy-style
perpendicular walk and per-pixel opacity chain
(`/root/reference/src/draw/line.rs:9-166`,
`/root/reference/src/draw/opacity_calculator.rs:1-185`), kept as the
independent second implementation of stroke semantics — the stroke
analogue of `draw/spans.py::fill_spans_walk`.  Fuzzed against the C++
oracle (`native/oracle.cpp`) in tests/test_stroke_walk_spec.py so a
shared misreading of the reference cannot hide in both the oracle and
the device kernels (VERDICT r2 item 7).

This module intentionally mirrors the reference's control flow
line-by-line rather than this repo's closed-form reformulations; it is
not a production path.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

LINE_CAP_BUTT = 0
LINE_CAP_ROUND = 1
LINE_CAP_SQUARE = 2


def _is_non_trivial_cap(cap: Optional[int]) -> bool:
    return cap in (LINE_CAP_ROUND, LINE_CAP_SQUARE)


class DashSegment:
    __slots__ = ("start_from", "start_to", "end_from", "end_to",
                 "opacity_mul", "original_endpoints")

    def __init__(self, start_from, start_to, end_from, end_to, opacity_mul,
                 original_endpoints):
        self.start_from = start_from
        self.start_to = start_to
        self.end_from = end_from
        self.end_to = end_to
        self.opacity_mul = opacity_mul
        self.original_endpoints = original_endpoints


def _compute_segments(half_line_width: float, dashes: List[float],
                      line_cap: Optional[int]):
    segments: List[DashSegment] = []
    len_before = 0.0
    # First dash reused once so the very first cap isn't missed.
    dash_indexes = list(range(len(dashes))) + ([0] if dashes else [])
    for idx in dash_indexes:
        dash = dashes[idx]
        start = len_before
        if idx != 0 or not segments:
            len_before += dash
        if idx % 2 != 0:
            continue
        end = start + dash
        original_endpoints = (start, end) if line_cap == LINE_CAP_ROUND else None
        if _is_non_trivial_cap(line_cap):
            start -= half_line_width
            end += half_line_width
        midpoint = (start + end) / 2.0
        segments.append(DashSegment(
            min(start - 0.5, midpoint - 1.0),
            min(start + 0.5, midpoint),
            max(end - 0.5, midpoint),
            max(end + 0.5, midpoint + 1.0),
            min(end - start, 1.0),
            original_endpoints,
        ))
    return segments, len_before


def _rust_max(a: float, b: float) -> float:
    """Rust f64::max: NaN-ignoring (returns the other operand)."""
    if math.isnan(a):
        return b
    if math.isnan(b):
        return a
    return a if a > b else b


def _rust_min(a: float, b: float) -> float:
    if math.isnan(a):
        return b
    if math.isnan(b):
        return a
    return a if a < b else b


def _opacity_by_center_distance(center_distance: float, hlw: float) -> float:
    # hlw may be NaN (round-cap sqrt of a negative, see calculate);
    # Rust's NaN-ignoring max/min then yield feather [0, 1), mul 1.
    feather_from = _rust_max(hlw - 0.5, 0.0)
    feather_to = _rust_max(hlw + 0.5, 1.0)
    feather_dist = feather_to - feather_from
    opacity_mul = _rust_min(2.0 * hlw, 1.0)
    if center_distance < feather_from:
        v = 1.0
    elif center_distance < feather_to:
        v = (feather_to - center_distance) / feather_dist
    else:
        v = 0.0
    return opacity_mul * v


class OpacityCalculator:
    def __init__(self, half_line_width: float, dashes: Optional[List[float]],
                 line_cap: Optional[int]):
        self.half_line_width = half_line_width
        if dashes is not None:
            self.dashes, self.total_dash_len = _compute_segments(
                half_line_width, dashes, line_cap
            )
        else:
            self.dashes, self.total_dash_len = [], 0.0
        self.traveled_distance = 0.0

    def add_traveled_distance(self, distance: float) -> None:
        self.traveled_distance += distance

    def _by_start_distance(self, start_distance: float):
        if not self.dashes:
            return 1.0, None
        dist_rem = self.traveled_distance + start_distance
        if self.total_dash_len > 0.0:
            dist_rem = math.fmod(dist_rem, self.total_dash_len)
        opacity = 0.0
        distance_in_cap = None
        for d in self.dashes:
            if dist_rem < d.start_from or dist_rem > d.end_to:
                continue
            if dist_rem <= d.start_to:
                base = (dist_rem - d.start_from) / (d.start_to - d.start_from)
            elif dist_rem < d.end_from:
                base = 1.0
            else:
                base = (d.end_to - dist_rem) / (d.end_to - d.end_from)
            opacity = max(opacity, d.opacity_mul * base)
            if d.original_endpoints is not None:
                a, b = d.original_endpoints
                if dist_rem < a:
                    cap = a - dist_rem
                elif dist_rem <= b:
                    cap = 0.0
                else:
                    cap = dist_rem - b
                if distance_in_cap is None or cap < distance_in_cap:
                    distance_in_cap = cap
        return opacity, distance_in_cap

    def calculate(self, center_distance: float, start_distance: float):
        sd_op, distance_in_cap = self._by_start_distance(start_distance)
        cap_dist = distance_in_cap if distance_in_cap is not None else 0.0
        hlw2 = self.half_line_width ** 2 - cap_dist ** 2
        # Rust f64::sqrt of a negative is NaN (no clamp in the
        # reference); the NaN then flows through the NaN-ignoring
        # max/min in get_opacity_by_center_distance.
        hlw = math.sqrt(hlw2) if hlw2 >= 0.0 else float("nan")
        cd = _opacity_by_center_distance(center_distance, hlw)
        op = _rust_min(sd_op, cd)
        return op, cd > 0.0


def _swap(a, b, should_swap: bool):
    return (b, a) if should_swap else (a, b)


def draw_line_walk(p1: Tuple[int, int], p2: Tuple[int, int],
                   calc: OpacityCalculator, emit) -> None:
    """`draw_line` (line.rs:65-166): emit(x, y, opacity) per visited
    pixel in visit order."""
    if p1 == p2:
        return

    def get_inc(from_, to):
        return 1 if from_ <= to else -1

    dx, dy = abs(p2[0] - p1[0]), abs(p2[1] - p1[1])
    should_swap = dx > dy
    mn, mx = _swap(p1[0], p1[1], should_swap)
    mn_last, mx_last = _swap(p2[0], p2[1], should_swap)
    mn_delta, mx_delta = _swap(dx, dy, should_swap)
    mn_inc, mx_inc = _swap(
        get_inc(p1[0], p2[0]), get_inc(p1[1], p2[1]), should_swap
    )

    error = 0
    p_error = 0

    def update_error(err: int):
        corrected = False
        if err + 2 * mn_delta > mx_delta:
            err -= 2 * mx_delta
            corrected = True
        err += 2 * mn_delta
        return err, corrected

    cd_numer_const = p2[0] * p1[1] - p2[1] * p1[0]
    sdx, sdy = p2[0] - p1[0], p2[1] - p1[1]
    cd_denom = math.sqrt(float(dy) * dy + float(dx) * dx)

    def draw_perpendiculars(mn_v, mx_v, p_err):
        for mul in (1, -1):
            p_mn = mx_v
            p_mx = mn_v
            err = mul * p_err
            while True:
                perp_x, perp_y = _swap(p_mx, p_mn, should_swap)
                cd_raw = cd_numer_const + sdy * perp_x - sdx * perp_y
                center_dist = abs(float(cd_raw)) / cd_denom
                long_start = math.hypot(perp_x - p1[0], perp_y - p1[1])
                short_start = math.sqrt(
                    max(long_start ** 2 - center_dist ** 2, 0.0)
                )
                opacity, is_in_line = calc.calculate(center_dist, short_start)
                if not is_in_line:
                    break
                emit(perp_x, perp_y, opacity)
                err, corrected = update_error(err)
                if corrected:
                    p_mn -= mul * mx_inc
                p_mx += mul * mn_inc

    while True:
        draw_perpendiculars(mn, mx, p_error)
        if mn == mn_last and mx == mx_last:
            break
        error, corrected = update_error(error)
        if corrected:
            mn += mn_inc
            p_error, p_corrected = update_error(p_error)
            if p_corrected:
                draw_perpendiculars(mn, mx, p_error)
        mx += mx_inc


def draw_lines_walk(pairs, width: float, dashes, cap: Optional[int],
                    use_caps_for_dashes: bool, emit) -> None:
    """`draw_lines` (line.rs:9-61): polyline with dash continuity and
    outer caps; emit(x, y, opacity) per visited pixel in visit order."""
    half_width = width / 2.0
    cap_for_dashes = cap if use_caps_for_dashes else None
    calc = OpacityCalculator(half_width, dashes, cap_for_dashes)
    outer_calc = OpacityCalculator(half_width, [0.0], cap)
    has_caps = _is_non_trivial_cap(cap)

    n = len(pairs)
    first = True
    for i, (p1, p2) in enumerate(pairs):
        draw_line_walk(p1, p2, calc, emit)
        calc.add_traveled_distance(math.hypot(p2[0] - p1[0], p2[1] - p1[1]))
        if p1 != p2 and has_caps:
            if first:
                ce = _push_away_from(p1, p2, half_width)
                draw_line_walk(p1, ce, outer_calc, emit)
            if i == n - 1:
                ce = _push_away_from(p2, p1, half_width)
                draw_line_walk(p2, ce, outer_calc, emit)
        first = False


def _push_away_from(p, other, by: float):
    dist = math.hypot(p[0] - other[0], p[1] - other[1])
    f = by / dist

    def rha(x):  # Rust f64::round: half away from zero
        return math.copysign(math.floor(abs(x) + 0.5), x)

    return (
        int(p[0] + rha((p[0] - other[0]) * f)),
        int(p[1] + rha((p[1] - other[1]) * f)),
    )
