"""Regenerate golden rendering fixtures (tests/rendered/*_expected.png)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_rendering import GOLDEN_DIR, ZOOM_CONFIGS, render_stitched  # noqa: E402
from osm_renderer_tpu.draw.png_writer import rgb_to_png  # noqa: E402


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    prod_only = "--production" in sys.argv
    configs = []
    if not prod_only:
        configs += [(key, render_stitched) for key in ZOOM_CONFIGS]
    if prod_only or "--all" in sys.argv:
        from tests.test_production_stylesheet import PROD_CONFIGS, render_production

        configs += [(key, render_production) for key in PROD_CONFIGS]
    for zoom_key, render in configs:
        img = render(zoom_key)
        out = os.path.join(GOLDEN_DIR, f"{zoom_key}_expected.png")
        with open(out, "wb") as f:
            f.write(rgb_to_png(img))
        print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
        diff = os.path.join(GOLDEN_DIR, f"{zoom_key}_diff.png")
        if os.path.exists(diff):
            os.remove(diff)


if __name__ == "__main__":
    main()
