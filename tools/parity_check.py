"""Render tiles through both backends and report pixel differences.

The CPU path is the reference-exact oracle; the device path is the
Pallas kernel (interpret mode off-TPU).  Useful when changing kernels
or styles: any per-channel difference above 1/255 is a bug.

Usage:
    python tools/parity_check.py GEODATA.bin STYLESHEET.mapcss Z X Y
        [--scale N] [--diff-png out.png]
    python tools/parity_check.py GEODATA.bin STYLESHEET.mapcss --all-z Z
        [--scale N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_renderer_tpu.utils.jax_setup import setup_jax


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("geodata")
    ap.add_argument("stylesheet")
    ap.add_argument("zxy", nargs="*", type=int, help="Z X Y")
    ap.add_argument("--all-z", type=int, default=None,
                    help="check every tile of the geodata at this zoom")
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--diff-png", default=None)
    args = ap.parse_args(argv)

    setup_jax()
    import jax
    import numpy as np

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.draw.drawer import CpuDrawer
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = GeodataReader.load(args.geodata)
    base, name = os.path.split(args.stylesheet)
    styler = Styler(parse_file(base, name), "josm")
    cpu = CpuDrawer(stylesheet_dir=base)
    dev = BatchRenderer(
        styler,
        backend="pallas",
        interpret=jax.default_backend() != "tpu",
        stylesheet_dir=base,
    )

    if args.all_z is not None:
        shift = 18 - args.all_z
        tx = reader.tiles["x"] >> shift
        ty = reader.tiles["y"] >> shift
        tiles = [Tile(args.all_z, x, y) for x, y in sorted(set(zip(tx.tolist(), ty.tolist())))]
    elif len(args.zxy) == 3:
        tiles = [Tile(args.zxy[0], args.zxy[1], args.zxy[2])]
    else:
        ap.error("pass Z X Y or --all-z Z")

    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    prepared = dev.prepare(te, args.scale)
    got = np.asarray(dev.render_prepared(prepared))
    needs_cpu = set(prepared.cpu_fallback_tiles)

    worst = 0
    status = 0
    for i, (entities, t) in enumerate(te):
        if i in needs_cpu:
            print(f"{t.zoom}/{t.x}/{t.y}: CPU-fallback tile (skipped)")
            continue
        want = cpu.draw_to_pixels(entities, t, args.scale, styler)
        diff = np.abs(want.astype(int) - got[i].astype(int))
        mx = int(diff.max())
        frac = float((diff > 0).mean())
        worst = max(worst, mx)
        flag = "OK" if mx <= 1 else "FAIL"
        if mx > 1:
            status = 1
        print(f"{t.zoom}/{t.x}/{t.y}: max diff {mx}/255, {100*frac:.3f}% pixels differ  [{flag}]")
        if args.diff_png and mx > 0:
            from PIL import Image

            amp = np.clip(diff.max(axis=-1) * 32, 0, 255).astype(np.uint8)
            Image.fromarray(amp, "L").save(args.diff_png)
            print(f"  diff heatmap -> {args.diff_png}")
    print(f"worst: {worst}/255 over {len(te)} tiles "
          f"({'within' if worst <= 1 else 'EXCEEDS'} the 1/255 parity bound)")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
