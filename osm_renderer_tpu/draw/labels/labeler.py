"""Label orchestration: icons + text with all-or-nothing collision.

Mirrors `labeler.rs` + the label part of `drawer.rs:221-262`:

* per styled entity: draw the icon at the anchor (centered), then text
  below it; any rejected pixel aborts the whole label;
* earlier successful labels win collisions (per label generation);
* label pass order: styled areas (ways: line text, multipolygons:
  center text), then styled nodes (center text).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw.labels.icons import IconCache
from osm_renderer_tpu.draw.labels.text_placer import TextPlacer
from osm_renderer_tpu.draw.labels import labelable
from osm_renderer_tpu.draw.oracle import OracleTile
from osm_renderer_tpu.geodata.reader import Multipolygon, Way
from osm_renderer_tpu.mapcss.styler import Style, Styler, TextPosition


class Labeler:
    def __init__(self, icon_base_path: Optional[str] = None, font_path: Optional[str] = None):
        self.text_placer = TextPlacer(font_path)
        self.icon_cache = IconCache(icon_base_path) if icon_base_path else None

    # -- per-entity --

    def label_entity(
        self,
        entity,
        style: Style,
        tile: Tile,
        scale: float,
        default_text_position: TextPosition,
        pixels: OracleTile,
    ) -> None:
        y_offset = self._label_with_icon(entity, style, tile, scale, pixels)
        if y_offset is not None:
            succeeded = self._label_with_text(
                entity, style, tile, scale, y_offset, default_text_position, pixels
            )
        else:
            succeeded = False
        pixels.bump_label_generation(succeeded)

    def _label_with_icon(self, entity, style, tile, scale, pixels) -> Optional[int]:
        if style.icon_image is None or self.icon_cache is None:
            return 0
        icon = self.icon_cache.get(style.icon_image)
        if icon is None:
            return 0
        pos = labelable.get_label_position(entity, tile, scale)
        if pos is None:
            return 0
        center_x, center_y = pos
        start_x = int(center_x - icon.width / 2.0)
        start_y = int(center_y - icon.height / 2.0)
        if pixels.label_icon(start_x, start_y, icon.rgba):
            return icon.height // 2
        return None

    def _label_with_text(
        self, entity, style, tile, scale, y_offset, default_text_position, pixels
    ) -> bool:
        if style.text_style is None:
            return True
        return self.text_placer.place(
            entity, style.text_style, tile, scale, y_offset,
            default_text_position, pixels,
        )

    # -- per-tile --

    def draw_labels(
        self, pixels: OracleTile, entities, tile: Tile, scale: float, styler: Styler
    ) -> None:
        styled_areas = styler.style_areas(
            entities.ways, entities.multipolygons, tile.zoom, True
        )
        styled_nodes = styler.style_entities(entities.nodes, tile.zoom, True)

        for entity, style in styled_areas:
            default_pos = (
                TextPosition.LINE if isinstance(entity, Way) else TextPosition.CENTER
            )
            self.label_entity(entity, style, tile, scale, default_pos, pixels)
        for entity, style in styled_nodes:
            self.label_entity(entity, style, tile, scale, TextPosition.CENTER, pixels)

    def composite_labels(
        self, base_rgb: np.ndarray, entities, tile: Tile, scale: float, styler: Styler
    ) -> np.ndarray:
        """Render labels on a scratch canvas and src-over them onto a
        device-rendered RGB tile (the base is fully opaque, so
        compositing over u8 stays within 1/255 of the exact path)."""
        ts = base_rgb.shape[0]
        scale_i = ts // 256
        # Native tile buffers are expensive to allocate; reuse per scale
        # (thread-unsafe reuse is fine: the device compositor runs the
        # batch loop on one thread).
        cache = getattr(self, "_scratch_tiles", None)
        if cache is None:
            cache = self._scratch_tiles = {}
        scratch = cache.get(scale_i)
        if scratch is None:
            scratch = cache[scale_i] = OracleTile(scale_i)
        scratch.reset(None)
        self.draw_labels(scratch, entities, tile, scale, styler)
        layer = scratch.export_label_layer()  # (ts, ts, 4) premultiplied f64
        a = layer[..., 3:4]
        out = layer[..., :3] * 255.0 + (1.0 - a) * base_rgb.astype(np.float64)
        return np.clip(np.trunc(out + 1e-9), 0, 255).astype(np.uint8)
