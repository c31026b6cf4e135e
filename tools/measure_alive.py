#!/usr/bin/env python
"""Measure the dead-start routing ceiling: over the z15 bigcity batch,
how many general (non-axis) work items lie on segments whose every
perpendicular-walk owner start is provably alive (cd < feather_to)?
Those segments could ride the cheap wide item path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.parser import parse_file
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.parallel.renderer import BatchRenderer
from osm_renderer_tpu.ops import render_pallas as rp


def seg_all_alive(x1, y1, x2, y2, hw):
    """Exact walk over bands 0..hK: True if every owner start has
    cd < feather_to (no dead starts).  Mirrors the kernel's invert()
    semantics: band bc's owner is the staircase start k with
    h(k)=k+g(k)=bc (on-line, c=c(k)) or, in a gap, c(k)+1."""
    feather_to = max(hw + 0.5, 1.0)
    dx = abs(x2 - x1)
    dy = abs(y2 - y1)
    mn = min(dx, dy)
    mx = max(max(dx, dy), 1)
    den = float(np.sqrt(float(dx * dx + dy * dy)))
    if den == 0.0:
        return True
    inv_den = 1.0 / den
    nc = x2 * y1 - y2 * x1
    sdx = x2 - x1
    sdy = y2 - y1
    swap = dx > dy
    mn0 = y1 if swap else x1
    mx0 = x1 if swap else y1
    x_inc = 1 if x1 <= x2 else -1
    y_inc = 1 if y1 <= y2 else -1
    mn_i = y_inc if swap else x_inc
    mx_i = x_inc if swap else y_inc
    K = mx
    # walk k = 0..K maintaining c(k), g(k) via the carry recurrences
    two_mn, two_mx = 2 * mn, 2 * mx
    c, rc = divmod(mx - 1, two_mx)
    g, rg = divmod(two_mn * c + mx - 1, two_mx)
    k = 0
    prev_h = -1
    prev_c = c
    prev_k = 0
    while True:
        h = k + g
        # on-line start (c, k):
        s_mn = mn0 + mn_i * c
        s_mx = mx0 + mx_i * k
        sx = s_mx if swap else s_mn
        sy = s_mn if swap else s_mx
        cd = abs(nc + sdy * sx - sdx * sy) * inv_den
        if cd >= feather_to:
            return False
        if prev_h >= 0 and h - prev_h > 1:
            # gap bands in (prev_h, h) are owned by invert()'s landing
            # start: k with h(k) <= bc, c_sel = c(k) + 1 -> (prev_c+1,
            # prev_k)
            s_mn_g = mn0 + mn_i * (prev_c + 1)
            s_mx_g = mx0 + mx_i * prev_k
            sxg = s_mx_g if swap else s_mn_g
            syg = s_mn_g if swap else s_mx_g
            cdg = abs(nc + sdy * sxg - sdx * syg) * inv_den
            if cdg >= feather_to:
                return False
        prev_h = h
        prev_c = c
        prev_k = k
        if k >= K:
            break
        # step up
        k += 1
        rc += two_mn
        if rc >= two_mx:
            rc -= two_mx
            c += 1
            rg += two_mn
            if rg >= two_mx:
                rg -= two_mx
                g += 1
    return True


def main():
    t0 = time.time()
    reader = GeodataReader.load("assets/fixtures/bigcity.bin")
    styler = Styler(parse_file("assets/stylesheets", "default.mapcss"), "josm")
    zoom = 15
    sh = 18 - zoom
    zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                        (reader.tiles["y"] >> sh).tolist())))
    tiles = [Tile(zoom, x, y) for x, y in zt]
    te = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles]
    dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256)
    prep = dev.prepare(te, scale=1)
    b = prep.batch
    kind = np.asarray(b.kind)
    geom = np.asarray(b.geom)
    hw = np.asarray(b.hw)
    isec = np.asarray(b.isec)
    items = np.asarray(b.items)
    print(f"prep done {time.time()-t0:.1f}s; chunks {kind.shape[0]}")

    ITEM_KINDS = (rp.KIND_STROKE_SOLID, rp.KIND_STROKE_SOLID_WIDE,
                  rp.KIND_STROKE_DASH, rp.KIND_STROKE_DASH_WIDE)
    THIN = (rp.KIND_STROKE_SOLID, rp.KIND_STROKE_DASH)
    tot_gen = tot_gen_thin = alive_gen_thin = 0
    tot_axis = 0
    dead_segs = alive_segs = 0
    hw_hist = {}
    for ch in range(kind.shape[0]):
        k = int(kind[ch])
        if k not in ITEM_KINDS:
            continue
        sec = isec[ch]
        tot_axis += int(sec[3])
        # general sections: slots 4..7, entries [sec[3], sec[7])
        gen_items = items[ch, 0, sec[3]:sec[7]]
        gen_items = gen_items[gen_items >= 0]
        tot_gen += len(gen_items)
        if k not in THIN:
            continue
        tot_gen_thin += len(gen_items)
        sgs = np.unique(gen_items & 127)
        c_hw = float(hw[ch])
        hw_hist[round(c_hw, 2)] = hw_hist.get(round(c_hw, 2), 0) + len(gen_items)
        amap = {}
        for sg in sgs:
            g = geom[ch, :, sg]
            amap[sg] = seg_all_alive(int(g[0]), int(g[1]), int(g[2]), int(g[3]), c_hw)
        alive_segs += sum(amap.values())
        dead_segs += len(amap) - sum(amap.values())
        alive_gen_thin += int(sum(amap[sg] for sg in (gen_items & 127)))

    print(f"axis items          : {tot_axis}")
    print(f"general items       : {tot_gen}  (thin: {tot_gen_thin}, wide-kind: {tot_gen - tot_gen_thin})")
    print(f"thin general, all-alive segs: {alive_segs} segs / dead {dead_segs}")
    print(f"thin general items on all-alive segs: {alive_gen_thin} "
          f"({100.0*alive_gen_thin/max(tot_gen_thin,1):.1f}% of thin general)")
    reroutable = alive_gen_thin + (tot_gen - tot_gen_thin)
    print(f"=> items already wide or reroutable: {reroutable} / {tot_gen} "
          f"({100.0*reroutable/max(tot_gen,1):.1f}%)")
    print("thin-general item hw histogram:", dict(sorted(hw_hist.items())))
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
