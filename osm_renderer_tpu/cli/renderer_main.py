"""Renderer CLI: `python -m osm_renderer_tpu.cli.renderer_main CONFIG [OSM_IDS...]`.

INI config (same surface as the reference, `bin/renderer.rs:38-60`):

    [http]
    address = 127.0.0.1:8080
    [geodata]
    file = city.bin
    [style]
    file = stylesheet/main.mapcss
    type = josm            ; or mapsme
    font-mul = 1.5         ; optional

Extra (framework-specific, optional):
    [render]
    backend = cpu          ; or device
    precision = fast       ; or exact (device backend)
    png-level = 1          ; deflate level (1 = max throughput [default, matches the benchmarked configuration], 6 = smaller tiles)
    labels = yes
    png-cache = 512        ; served-PNG LRU (device backend; 0 disables)
    warmup = yes           ; device backend: pre-compile serving
                           ; signatures before accepting traffic
"""

from __future__ import annotations

import asyncio
import configparser
import os
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: renderer CONFIG [OSM_IDS]", file=sys.stderr)
        return 1

    config = configparser.ConfigParser()
    if not config.read(argv[0]):
        print(f"Failed to parse config from {argv[0]}", file=sys.stderr)
        return 1

    def require(section: str, name: str) -> str:
        try:
            return config[section][name]
        except KeyError:
            print(f"Property {name} is missing in section [{section}]", file=sys.stderr)
            raise SystemExit(1)

    address = require("http", "address")
    geodata_file = require("geodata", "file")
    stylesheet_file = require("style", "file")
    stylesheet_type = require("style", "type")
    if stylesheet_type not in ("josm", "mapsme"):
        print(f"Unknown stylesheet type: {stylesheet_type}", file=sys.stderr)
        return 1
    font_mul = None
    if config.has_option("style", "font-mul"):
        font_mul = float(config["style"]["font-mul"])

    osm_ids = {int(x) for x in argv[1:]} if len(argv) > 1 else None

    backend = config.get("render", "backend", fallback="cpu")
    precision = config.get("render", "precision", fallback="fast")
    png_level = int(config.get("render", "png-level", fallback="1"))
    labels = config.getboolean("render", "labels", fallback=True)
    png_cache = int(config.get("render", "png-cache", fallback="512"))

    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.server.http import TileService, run_server
    from osm_renderer_tpu.utils.jax_setup import setup_jax

    if backend == "device":
        setup_jax()

    base_path, file_name = os.path.split(stylesheet_file)
    rules = parse_file(base_path, file_name)
    styler = Styler(rules, stylesheet_type, font_mul)

    service = TileService(
        geodata_file,
        styler,
        base_path,
        backend=backend,
        osm_ids=osm_ids,
        enable_labels=labels,
        precision=precision,
        png_level=png_level,
        png_cache_tiles=png_cache,
    )
    if backend == "device" and config.getboolean("render", "warmup", fallback=True):
        print("Warming up device serving signatures...")
        n = service.warmup()
        print(f"Warmed {n} tiles")
    print(f"Serving tiles on http://{address} (backend={backend})")
    asyncio.run(run_server(address, service))
    return 0


if __name__ == "__main__":
    sys.exit(main())
