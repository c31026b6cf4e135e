"""Executable spec for the glyph scanline rasterizer, transcribed
line-by-line from the reference Rust (`/root/reference/src/draw/font/
rasterizer.rs:27-148`).

This is deliberately a *transcription*, not a reimplementation: it
exists so the production C++ oracle glyph path (`native/oracle.cpp`
GlyphRasterizer, written analytically from reading the same Rust) has
an independent executable ground truth — the same
two-implementations cross-check fills (`draw/spans.py` walk vs closed
form) and strokes (`tests/stroke_walk_spec.py`) already have.  A shared
misreading of the trapezoidal-area / winding math would diverge here.

Semantics (rasterizer.rs):
- `draw_line` accumulates, per unit-height y stripe, the exact signed
  area each pixel's column loses to the edge (`a`), plus a running
  winding delta (`s`) at the column just past the edge
  (rasterizer.rs:43-83).  Sign is +1 for downward edges (y0 <= y1).
- `draw_quad` flattens a quadratic Bezier by recursive midpoint
  subdivision with the 1.0001 chord-length stopping test
  (rasterizer.rs:86-107).
- Emission (`save_to_figure`, rasterizer.rs:109-148): per stripe, walk
  x ascending across the union of `a` and `s` keys, accumulate the
  winding deltas, and emit alpha = min(a[x] + sum(s[..x]), 1.0) where
  positive.

Test-only: the production text path rasterizes through the C++ oracle
(`osm_renderer_tpu/draw/oracle.py` GlyphRasterizer) and the quantized
atlas (`draw/labels/atlas.py`).
"""

import math


class GlyphSpec:
    """Transcription of rasterizer.rs `Rasterizer` (stripes only —
    color/figure emission is handled by `export` below)."""

    def __init__(self):
        # y -> ({x: area}, {x: winding delta}); plain dicts preserve
        # accumulation order, sorted at emission like the BTreeMaps.
        self.stripes = {}

    def _stripe(self, y):
        st = self.stripes.get(y)
        if st is None:
            st = ({}, {})
            self.stripes[y] = st
        return st

    def draw_line(self, x0, y0, x1, y1):
        # rasterizer.rs:27-84
        delta = y1 - y0
        if delta == 0.0:
            return
        sign = 1.0 if y0 <= y1 else -1.0
        slope = (x1 - x0) / delta
        # slope.recip() — IEEE: +-inf for vertical edges (never consumed,
        # since their trapezoid_width is 0); Python raises, so guard.
        recip = (
            math.copysign(math.inf, slope) if slope == 0.0 else 1.0 / slope
        )

        y_min = min(y0, y1)
        y_max = max(y0, y1)

        for y in range(math.floor(y_min), math.floor(y_max) + 1):
            a, s = self._stripe(y)
            y_bottom = max(float(y), y_min)
            y_top = min(float(y + 1), y_max)
            y_delta = y_top - y_bottom

            x_at_bottom = x0 + (y_bottom - y0) * slope
            x_at_top = x0 + (y_top - y0) * slope

            if x_at_bottom <= x_at_top:
                flip_edge, x_smallest, x_largest = False, x_at_bottom, x_at_top
            else:
                flip_edge, x_smallest, x_largest = True, x_at_top, x_at_bottom

            x_to = math.floor(x_largest)
            for x in range(math.floor(x_smallest), x_to + 1):
                x_left = max(float(x), x_smallest)
                x_next = float(x + 1)
                x_right = min(x_next, x_largest)

                pixel_area = (x_next - x_right) * y_delta
                trapezoid_width = x_right - x_left
                if trapezoid_width > 0.0:
                    y_at_left = y0 + (x_left - x0) * recip
                    y_at_right = y0 + (x_right - x0) * recip
                    if flip_edge:
                        trapezoid_height = (y_top - y_at_left) + (y_top - y_at_right)
                    else:
                        trapezoid_height = (y_at_left - y_bottom) + (
                            y_at_right - y_bottom
                        )
                    pixel_area += trapezoid_width * trapezoid_height / 2.0
                a[x] = a.get(x, 0.0) + sign * pixel_area
            s[x_to + 1] = s.get(x_to + 1, 0.0) + sign * y_delta

    def draw_quad(self, x0, y0, x1, y1, x2, y2):
        # rasterizer.rs:86-107
        def dist_between(xa, ya, xb, yb):
            return math.hypot(abs(xa - xb), abs(ya - yb))

        d01 = dist_between(x0, y0, x1, y1)
        d12 = dist_between(x1, y1, x2, y2)
        d02 = dist_between(x0, y0, x2, y2)

        if d01 + d12 <= 1.0001 * d02:
            self.draw_line(x0, y0, x2, y2)
            return

        m01_x = (x0 + x1) / 2.0
        m01_y = (y0 + y1) / 2.0
        m12_x = (x1 + x2) / 2.0
        m12_y = (y1 + y2) / 2.0
        m012_x = (m01_x + m12_x) / 2.0
        m012_y = (m01_y + m12_y) / 2.0

        self.draw_quad(x0, y0, m01_x, m01_y, m012_x, m012_y)
        self.draw_quad(m012_x, m012_y, m12_x, m12_y, x2, y2)

    def bounds(self):
        """(x_min, x_max, y_min, y_max) over all stripe keys, or None."""
        xs = []
        ys = []
        for y, (a, s) in self.stripes.items():
            if not a and not s:
                continue
            ys.append(y)
            xs.extend(a.keys())
            xs.extend(s.keys())
        if not ys:
            return None
        return min(xs), max(xs), min(ys), max(ys)

    def export(self, x0, y0, w, h):
        """Dense (h, w) alpha field of the save_to_figure emission
        (rasterizer.rs:109-148): per stripe, x ascending over the union
        key range, alpha = min(a + running s, 1.0), emitted only where
        > 0.0 (zero elsewhere)."""
        out = [[0.0] * w for _ in range(h)]
        for y in sorted(self.stripes):
            a, s = self.stripes[y]
            if not a and not s:
                continue
            if y < y0 or y >= y0 + h:
                continue
            keys = list(a.keys()) + list(s.keys())
            x_min, x_max = min(keys), max(keys)
            s_acc = 0.0
            for x in range(x_min, x_max + 1):
                s_acc += s.get(x, 0.0)
                total = min(a.get(x, 0.0) + s_acc, 1.0)
                if total > 0.0 and x0 <= x < x0 + w:
                    out[y - y0][x - x0] = total
        return out
