"""TrueType font engine with stb_truetype-compatible semantics.

The reference uses the stb_truetype crate (`font/text_placer.rs:9`);
pixel parity of text requires matching its exact behaviors:

* `scale_for_pixel_height` = height / (hhea.ascent - hhea.descent);
* glyph outlines as a Move/Line/Curve vertex stream with stb's implied
  on-curve midpoints, computed with integer `>> 1` (floor) arithmetic;
* kerning from the legacy 'kern' table only (GPOS is NOT read — the
  bundled NotoSans has no 'kern', so kerning is effectively zero, and
  we replicate that);
* missing characters map to glyph 0.

Table access uses fontTools; outline point streams (with composite
glyphs resolved and transformed) come from glyf.getCoordinates, which
matches stb's composite handling.
"""

from __future__ import annotations

import functools
from typing import Iterator, List, NamedTuple, Optional, Tuple

from fontTools.ttLib import TTFont

MOVE_TO = 1
LINE_TO = 2
CURVE_TO = 3


class Vertex(NamedTuple):
    kind: int
    x: int
    y: int
    cx: int = 0
    cy: int = 0


class VMetrics(NamedTuple):
    ascent: int
    descent: int
    line_gap: int


class FontEngine:
    def __init__(self, path: str):
        self.font = TTFont(path, fontNumber=0, lazy=True)
        self.glyf = self.font["glyf"]
        self.hmtx = self.font["hmtx"]
        hhea = self.font["hhea"]
        self._vm = VMetrics(hhea.ascent, hhea.descent, hhea.lineGap)
        self.cmap = self.font.getBestCmap()
        self.glyph_order = self.font.getGlyphOrder()
        self._kern = self._load_kern()

    def _load_kern(self):
        if "kern" not in self.font:
            return {}
        table = {}
        for sub in self.font["kern"].kernTables:
            if getattr(sub, "format", None) == 0:
                for (l, r), v in sub.kernTable.items():
                    table[(l, r)] = v
        return table

    # --- stb-compatible API ---

    def scale_for_pixel_height(self, height: float) -> float:
        # stb computes this in f32 (FontInfo scale is f32 in the crate).
        import numpy as np

        return float(
            np.float32(height) / np.float32(self._vm.ascent - self._vm.descent)
        )

    def find_glyph_index(self, codepoint: int) -> int:
        name = self.cmap.get(codepoint)
        if name is None:
            return 0
        return self.font.getGlyphID(name)

    def advance_width(self, glyph_id: int) -> int:
        name = self.glyph_order[glyph_id]
        return self.hmtx[name][0]

    def kern_advance(self, g1: int, g2: int) -> int:
        if not self._kern:
            return 0
        n1, n2 = self.glyph_order[g1], self.glyph_order[g2]
        return self._kern.get((n1, n2), 0)

    def v_metrics(self) -> VMetrics:
        return self._vm

    @functools.lru_cache(maxsize=4096)
    def glyph_shape(self, glyph_id: int) -> Optional[Tuple[Vertex, ...]]:
        """stb GetGlyphShape: vertex stream in font units."""
        name = self.glyph_order[glyph_id]
        glyph = self.glyf[name]
        if glyph.numberOfContours == 0:
            return None
        coords, end_pts, flags = glyph.getCoordinates(self.glyf)
        if len(coords) == 0:
            return None

        verts: List[Vertex] = []
        start = 0
        for end in end_pts:
            self._contour_to_vertices(coords, flags, start, end, verts)
            start = end + 1
        return tuple(verts)

    @staticmethod
    def _contour_to_vertices(coords, flags, i0: int, i1: int, out: List[Vertex]):
        """One contour -> stb vertex stream (integer midpoint arithmetic)."""
        n = i1 - i0 + 1
        if n <= 0:
            return
        on = [bool(flags[i] & 1) for i in range(i0, i1 + 1)]
        pts = [tuple(map(int, coords[i])) for i in range(i0, i1 + 1)]

        start_off = not on[0]
        if start_off:
            scx, scy = pts[0]
            if n > 1 and not on[1]:
                sx = (pts[0][0] + pts[1][0]) >> 1
                sy = (pts[0][1] + pts[1][1]) >> 1
                first = 1
            else:
                if n > 1:
                    sx, sy = pts[1]
                    first = 2
                else:
                    sx, sy = scx, scy
                    first = 1
        else:
            sx, sy = pts[0]
            scx = scy = 0
            first = 1

        out.append(Vertex(MOVE_TO, sx, sy))
        was_off = False
        cx = cy = 0
        for i in range(first, n):
            x, y = pts[i]
            if not on[i]:
                if was_off:
                    out.append(Vertex(CURVE_TO, (cx + x) >> 1, (cy + y) >> 1, cx, cy))
                cx, cy = x, y
                was_off = True
            else:
                if was_off:
                    out.append(Vertex(CURVE_TO, x, y, cx, cy))
                else:
                    out.append(Vertex(LINE_TO, x, y))
                was_off = False

        # close the shape
        if start_off:
            if was_off:
                out.append(Vertex(CURVE_TO, (cx + scx) >> 1, (cy + scy) >> 1, cx, cy))
            out.append(Vertex(CURVE_TO, sx, sy, scx, scy))
        else:
            if was_off:
                out.append(Vertex(CURVE_TO, sx, sy, cx, cy))
            else:
                out.append(Vertex(LINE_TO, sx, sy))
