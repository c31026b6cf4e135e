#!/usr/bin/env python
"""TRUE device-time measurement for the Pallas render kernel.

Wall-clock rep loops on this tunnel-attached box fold a fixed ~35 ms
host<->device sync latency plus ~0.3 ms/call host dispatch into every
measurement (amortized over reps), which round-3 misread as a
"per-chunk grid-step floor".  This tool instead captures a profiler
trace around N pipelined reps and reports the summed on-device
duration of the pallas program ("run" events on the TPU device line),
which is what kernel work actually costs.  Usage:

    python tools/kdevice.py [--reps 8] [--zoom 15] [--geodata assets/fixtures/bigcity.bin]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()


def device_ms_per_call(trace_dir: str, reps: int) -> dict:
    """Sum per-op device durations from the newest trace in trace_dir."""
    f = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    out = {}
    for e in ev:
        if e.get("ph") != "X":
            continue
        proc = pids.get(e["pid"], "")
        if "TPU" not in str(proc):
            continue
        out[e["name"]] = out.get(e["name"], 0.0) + e.get("dur", 0.0)
    # The pallas program shows up as "run.N" / "jit_run(...)"; take the
    # largest device op as the kernel (everything else is ~0).
    name, total = max(out.items(), key=lambda kv: kv[1])
    return {"op": name, "device_ms_per_call": total / 1e3 / reps, "all": out}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--zoom", type=int, default=15)
    ap.add_argument("--geodata", default="assets/fixtures/bigcity.bin")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    reader = GeodataReader.load(args.geodata)
    styler = Styler(parse_file("assets/stylesheets", "default.mapcss"), "josm")
    sh = 18 - args.zoom
    zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                        (reader.tiles["y"] >> sh).tolist())))
    tiles = [Tile(args.zoom, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    n = len(te)

    dev = BatchRenderer(styler, backend="pallas")
    prep = dev.prepare(te, scale=1)
    out = dev.render_prepared_planar(prep)
    out.block_until_ready()

    c0 = np.asarray(prep.batch.color)
    ps = [
        prep._replace(batch=prep.batch._replace(
            color=jnp.asarray(c0 * (1.0 - 1e-4 * (i + 1)))))
        for i in range(args.reps)
    ]
    jax.block_until_ready([q.batch.color for q in ps])

    tdir = tempfile.mkdtemp(prefix="kdevice_trace_")
    with jax.profiler.trace(tdir):
        outs = [dev.render_prepared_planar(q) for q in ps]
        jax.block_until_ready(outs)
    r = device_ms_per_call(tdir, args.reps)
    ms = r["device_ms_per_call"]
    print(f"device: {ms:7.3f} ms/batch ({n} tiles, {n/ms*1e3:7.0f} t/s) [{r['op']}]")


if __name__ == "__main__":
    main()
