"""End-to-end golden-image rendering tests (mirror of the reference's
`tests/test_rendering.rs`): render a fixed corpus of tiles through the
full CPU pipeline (fills, casings, strokes, dashes, labels), stitch
them with 1px red grid lines, and compare per-pixel against committed
expected PNGs.  On mismatch a `<zoom>_diff.png` artifact (red = wrong
pixels) is written next to the goldens.

Regenerate the goldens with `python tools/canonize.py` after intended
rendering changes.
"""

import io
import os

import numpy as np
import pytest

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw.drawer import CpuDrawer
from osm_renderer_tpu.draw.labels.labeler import Labeler
from osm_renderer_tpu.draw.png_writer import rgb_to_png
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler

from tests.conftest import REPO_ROOT

GOLDEN_DIR = os.path.join(REPO_ROOT, "tests", "rendered")
STYLESHEET_DIR = os.path.join(REPO_ROOT, "assets", "stylesheets")

RED = np.array([255, 0, 0], dtype=np.uint8)

ZOOM_CONFIGS = {
    14: ((1, 1), 1),   # (tiles per side, scale)
    15: ((2, 2), 1),
    16: ((2, 2), 1),
    17: ((2, 2), 1),
    18: ((2, 2), 1),
    "18_2x": ((1, 1), 2),
}


def _reader():
    from tests.test_labels import city  # reuse fixture logic

    # Build directly (module-scope fixtures aren't shareable here).
    import subprocess
    import sys
    import tempfile

    from osm_renderer_tpu.geodata.importer import import_osm
    from osm_renderer_tpu.geodata.reader import GeodataReader

    osm = os.path.join(REPO_ROOT, "assets", "fixtures", "minicity.osm")
    if not os.path.exists(osm):
        os.makedirs(os.path.dirname(osm), exist_ok=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "tools", "make_fixture.py"),
             osm, "--blocks", "24"],
            check=True,
        )
    bin_path = os.path.join(tempfile.gettempdir(), "osmr_golden_minicity.bin")
    if not os.path.exists(bin_path) or os.path.getmtime(bin_path) < os.path.getmtime(osm):
        import_osm(osm, bin_path)
    return GeodataReader.load(bin_path)


def render_stitched(zoom_key) -> np.ndarray:
    (nx, ny), scale = ZOOM_CONFIGS[zoom_key]
    zoom = int(str(zoom_key).split("_")[0])
    reader = _reader()
    styler = Styler(parse_file(STYLESHEET_DIR, "default.mapcss"), "josm")
    drawer = CpuDrawer(labeler=Labeler(icon_base_path=STYLESHEET_DIR))

    tx = reader.tiles["x"] >> (18 - zoom)
    ty = reader.tiles["y"] >> (18 - zoom)
    u = sorted(set(zip(tx.tolist(), ty.tolist())))
    cx, cy = u[len(u) // 2]

    ts = 256 * scale
    canvas = np.zeros((ny * ts, nx * ts, 3), dtype=np.uint8)
    for iy in range(ny):
        for ix in range(nx):
            tile = Tile(zoom, cx + ix, cy + iy)
            entities = reader.get_entities_in_tile_with_neighbors(tile)
            rgb = drawer.draw_to_pixels(entities, tile, scale, styler)
            canvas[iy * ts : (iy + 1) * ts, ix * ts : (ix + 1) * ts] = rgb
    # Red grid lines on tile boundaries (like the reference harness).
    for iy in range(ny):
        canvas[iy * ts] = RED
    for ix in range(nx):
        canvas[:, ix * ts] = RED
    return canvas


def _read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


@pytest.mark.parametrize("zoom_key", list(ZOOM_CONFIGS.keys()))
def test_rendering_golden(zoom_key):
    expected_path = os.path.join(GOLDEN_DIR, f"{zoom_key}_expected.png")
    if not os.path.exists(expected_path):
        pytest.skip(f"golden {expected_path} missing; run tools/canonize.py")
    actual = render_stitched(zoom_key)
    expected = _read_png(expected_path)
    assert actual.shape == expected.shape
    if not np.array_equal(actual, expected):
        diff = np.zeros_like(actual)
        bad = (actual != expected).any(axis=-1)
        diff[bad] = RED
        diff_path = os.path.join(GOLDEN_DIR, f"{zoom_key}_diff.png")
        with open(diff_path, "wb") as f:
            f.write(rgb_to_png(diff))
        n_bad = int(bad.sum())
        raise AssertionError(
            f"zoom {zoom_key}: {n_bad} differing pixels; see {diff_path}"
        )
