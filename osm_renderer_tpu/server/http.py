"""Slippy-tile HTTP server.

URL contract matches the reference (`http_server.rs:229-267`):
`GET /{z}/{x}/{y}[@Nx].png[?query]` with z <= 18, plus `/shutdown` and
`/perf_stats`; responses carry `Access-Control-Allow-Origin: *` and
`Connection: close`.

Two serving modes:
* backend="cpu": per-request rendering on a thread pool of oracle
  drawers (the reference's thread-per-core model);
* backend="device": an async micro-batcher groups concurrent tile
  requests into one accelerator dispatch (tile data parallelism) —
  the TPU-native serving path.
"""

from __future__ import annotations

import asyncio
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from osm_renderer_tpu.core.tile import MAX_ZOOM, Tile
from osm_renderer_tpu.draw.drawer import CpuDrawer
from osm_renderer_tpu.draw.labels.labeler import Labeler
from osm_renderer_tpu.draw.png_writer import rgb_to_png
from osm_renderer_tpu.geodata.reader import GeodataReader
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu import perfstats


def extract_tile_from_path(path: str) -> Optional[Tuple[Tile, int]]:
    """Parse `/{z}/{x}/{y}[@Nx].png[?query]` -> (tile, scale)."""
    qpos = path.rfind("?")
    real_path = path[:qpos] if qpos >= 0 else path
    if real_path.endswith(".png"):
        real_path = real_path[: -len(".png")]
    tokens = real_path.rsplit("/", 3)
    if len(tokens) < 3:
        return None
    tokens = tokens[-3:]
    z_str, x_str, y_str = tokens
    scale = 1
    if "@" in y_str:
        y_str, _, scale_str = y_str.partition("@")
        scale_str = scale_str.rstrip("x")
        try:
            scale = int(scale_str)
        except ValueError:
            return None
    try:
        z, x, y = int(z_str), int(x_str), int(y_str)
    except ValueError:
        return None
    if z < 0 or z > MAX_ZOOM or scale < 1 or scale > 4:
        return None
    return Tile(z, x, y), scale


class _ShardedTileView:
    """Per-tile view over multiple per-chip RleTileViews (multi-device
    groups): tile i lives at shard_views[remap[i][0]] slot remap[i][1]."""

    def __init__(self, shard_views, remap, T: int, ts: int):
        self._views = shard_views
        self._remap = remap
        self.T = T
        self.ts = ts

    def rgb(self, i: int):
        v, j = self._remap[i]
        return self._views[v].rgb(j)

    def png8(self, i: int, level: int):
        v, j = self._remap[i]
        return self._views[v].png8(j, level)


class TileService:
    """Shared immutable state + rendering dispatch."""

    # Sub-batch size for streaming cold-heavy groups: host assembly
    # runs ~8 ms/tile on one core while a 16-tile sub-batch's device
    # render + transfers take a similar wall — pipelining the two keeps
    # both resources busy (see render_tiles_device).
    COLD_SUB = 16

    def __init__(
        self,
        geodata_file: str,
        styler: Styler,
        stylesheet_dir: str,
        backend: str = "cpu",
        osm_ids: Optional[Set[int]] = None,
        enable_labels: bool = True,
        precision: str = "fast",
        png_level: int = 1,
        png_cache_tiles: int = 512,
    ):
        self.reader = GeodataReader.load(geodata_file)
        self.styler = styler
        self.osm_ids = osm_ids
        self.backend = backend
        self.png_level = png_level
        # Served-PNG LRU: geodata and stylesheet are immutable for the
        # server's lifetime, so a repeat request is a byte-identical
        # response — skip the whole pipeline.  (The reference re-renders
        # every request; disabled under the osm_ids debug filter and on
        # the CPU backend to keep its reference semantics.)
        self._png_cache: "OrderedDict" = OrderedDict()
        self._png_cache_lock = threading.Lock()
        self.png_cache_tiles = (
            0 if (osm_ids or backend != "device") else png_cache_tiles
        )
        # Label-layer cache mirrors the chunk-stream cache (off under
        # the osm_ids debug filter; the CPU backend uses the exact
        # per-glyph path like the reference).
        self.labeler = (
            Labeler(
                icon_base_path=stylesheet_dir,
                use_atlas=backend == "device",
                label_cache_tiles=0 if (osm_ids or backend != "device") else 512,
            )
            if enable_labels
            else None
        )
        self.perf_stats = perfstats.PerfStats()
        self._perf_lock = threading.Lock()
        self._local = threading.local()
        self._stylesheet_dir = stylesheet_dir
        if backend == "device":
            import jax

            from osm_renderer_tpu.parallel.renderer import BatchRenderer
            from osm_renderer_tpu.utils.jax_setup import setup_jax

            setup_jax()
            self.devices = jax.devices()
            if precision == "exact":
                self.batch_renderer = BatchRenderer(
                    styler, backend="jnp", precision="exact"
                )
                self.batch_renderers = [self.batch_renderer]
                self.devices = self.devices[:1]
            else:
                # The Pallas kernel needs a real TPU; elsewhere (tests,
                # CPU-only hosts) it runs in interpret mode.  The chunk
                # cache amortizes host assembly across repeated tile
                # requests (disabled under the osm_ids debug filter,
                # which changes tile content).
                #
                # Multi-chip serving runs ONE BatchRenderer PER CHIP —
                # each with its own device-pinned chunk arena and
                # caches, executing the identical single-chip program —
                # with a stable tile -> chip mapping (_dev_idx) so a
                # tile always hits the chip that cached it.  This is
                # the reference's scaling model (a thread-per-core pool
                # running the real serving loop, http_server.rs:50-116)
                # lifted to accelerators.
                def _mk(dev):
                    return BatchRenderer(
                        styler,
                        backend="pallas",
                        interpret=jax.default_backend() != "tpu",
                        stylesheet_dir=stylesheet_dir,
                        tile_bucket=True,
                        chunk_cache_tiles=0 if osm_ids else 512,
                        # Device-resident chunk arena: warm batches
                        # assemble on device from one packed upload (the
                        # h2d link is the warm-serving bottleneck on
                        # tunnel hosts).
                        arena=not osm_ids,
                        device=dev,
                    )

                if len(self.devices) <= 1:
                    self.batch_renderers = [_mk(None)]
                else:
                    self.batch_renderers = [_mk(d) for d in self.devices]
                self.batch_renderer = self.batch_renderers[0]
        else:
            self.batch_renderer = None
            self.batch_renderers = []

    def warmup(self, n_tiles: int = 16) -> int:
        """Pre-compile the serving signatures before accepting traffic.

        Renders up to `n_tiles` real tiles around the extract (z15 via
        the z18 tile index) through the full device path: first-request
        latency then drops from ~40 s (Mosaic compile) to the steady
        per-batch cost.  Returns the number of tiles warmed."""
        if self.backend != "device" or not len(self.reader.tiles):
            return 0
        xs = self.reader.tiles["x"] >> 3
        ys = self.reader.tiles["y"] >> 3
        seen = []
        seen_set = set()
        for x, y in zip(xs.tolist(), ys.tolist()):
            if (x, y) not in seen_set:
                seen_set.add((x, y))
                seen.append(Tile(15, x, y))
                if len(seen) >= n_tiles:
                    break
        try:
            # Two passes: the first learns the serving palette (v1
            # wire) and fills the chunk caches; the second compiles the
            # indexed-wire (v2) encode graph, so no request pays it.
            self.render_tiles_device([(t, 1) for t in seen])
            with self._png_cache_lock:
                self._png_cache.clear()
            self.render_tiles_device([(t, 1) for t in seen])
        except Exception as e:  # pragma: no cover - warmup is best-effort
            print(f"warmup failed (serving continues): {e}")
        return len(seen)

    def png_cache_get(self, tile: Tile, scale: int) -> Optional[bytes]:
        if not self.png_cache_tiles:
            return None
        key = (tile.zoom, tile.x, tile.y, scale)
        with self._png_cache_lock:
            png = self._png_cache.get(key)
            if png is not None:
                self._png_cache.move_to_end(key)
            return png

    def _png_cache_put(self, tile: Tile, scale: int, png: bytes) -> None:
        if not self.png_cache_tiles:
            return
        key = (tile.zoom, tile.x, tile.y, scale)
        with self._png_cache_lock:
            self._png_cache[key] = png
            while len(self._png_cache) > self.png_cache_tiles:
                self._png_cache.popitem(last=False)

    def _cpu_drawer(self) -> CpuDrawer:
        drawer = getattr(self._local, "drawer", None)
        if drawer is None:
            drawer = CpuDrawer(
                labeler=self.labeler, stylesheet_dir=self._stylesheet_dir
            )
            self._local.drawer = drawer
        return drawer

    def render_tile_cpu(self, tile: Tile, scale: int) -> bytes:
        perfstats.start_tile(tile.zoom)
        with perfstats.measure("Get tile entities"):
            entities = self.reader.get_entities_in_tile_with_neighbors(
                tile, self.osm_ids
            )
        with perfstats.measure("Draw tile"):
            rgb = self._cpu_drawer().draw_to_pixels(entities, tile, scale, self.styler)
        with perfstats.measure("RGB triples to PNG"):
            png = rgb_to_png(rgb, self.png_level)
        with self._perf_lock:
            perfstats.finish_tile(self.perf_stats)
        return png

    def _dispatch_group_device(
        self, tiles_entities, scale: int, t_prep0: float, compacts=None
    ):
        """Single-device: prepare + async render dispatch, WITHOUT
        waiting for the device or the readback — callers can assemble
        the next sub-batch while this one renders and transfers
        (`render_tiles_device` streams cold groups this way).

        `compacts`: per-tile committed label layers — on the arena
        path labeled tiles composite ON DEVICE (the render jit blits
        the label slab; parallel/label_slab.py) and come back with
        labels baked in."""
        import time as _time

        prepared = self.batch_renderer.prepare(
            tiles_entities, scale, label_layers=compacts
        )
        prep_dt = _time.perf_counter() - t_prep0
        needs_cpu = set(getattr(prepared, "cpu_fallback_tiles", ()))
        device_labeled = set(getattr(prepared, "device_labeled", ()))
        if prepared.precision == "pallas":
            # Compressed readback: the d2h link is the serving
            # bottleneck on tunnel-attached hosts, so tiles cross it
            # run-length encoded (see RleRendered).
            t0 = _time.perf_counter()
            res = self.batch_renderer.render_prepared_rle(prepared)
            try:
                res.wire.copy_to_host_async()
            except Exception:
                pass
            return ("rle", res, needs_cpu, prep_dt, t0, device_labeled)
        t0 = _time.perf_counter()
        out = self.batch_renderer.render_prepared(prepared)
        return ("raw", out, needs_cpu, prep_dt, t0, device_labeled)

    def _collect_group_device(self, pending):
        """Block on a dispatched sub-batch: (view, needs_cpu, prep_dt,
        exec_dt, d2h_dt, device_labeled).  Execution (dispatch ->
        ready) and readback (device -> host) are genuinely different
        resources (chip vs interconnect), reported as distinct spans.
        `view` is a per-tile RleTileView: tiles decode lazily, and v2
        tiles without labels can skip RGB entirely (PNG-8 from the
        wire)."""
        import time as _time

        from osm_renderer_tpu.parallel.renderer import RleTileView

        kind, res, needs_cpu, prep_dt, t0, device_labeled = pending
        if kind == "rle":
            res.wire.block_until_ready()
            exec_dt = _time.perf_counter() - t0
            t1 = _time.perf_counter()
            view = self.batch_renderer.fetch_tile_view(res)
            d2h_dt = _time.perf_counter() - t1
            return view, needs_cpu, prep_dt, exec_dt, d2h_dt, device_labeled

        out = res
        out.block_until_ready()
        exec_dt = _time.perf_counter() - t0
        t1 = _time.perf_counter()
        rgb = np.asarray(out)
        d2h_dt = _time.perf_counter() - t1
        view = RleTileView(rgb.shape[0], rgb.shape[1], rgb=rgb)
        return view, needs_cpu, prep_dt, exec_dt, d2h_dt, device_labeled

    def _dev_idx(self, tile: Tile) -> int:
        """Stable tile -> chip mapping: a tile always renders on the
        chip whose arena/chunk cache holds it (multi-chip warm serving
        would otherwise re-assemble tiles on every chip they bounce
        to)."""
        n = len(self.batch_renderers)
        if n <= 1:
            return 0
        return ((tile.x * 0x9E3779B1) ^ (tile.y * 0x85EBCA77) ^ tile.zoom) % n

    def _render_group_multi(
        self, tiles_entities, scale: int, t_prep0: float, compacts=None
    ):
        """Multi-accelerator split: each chip runs the FULL single-chip
        serving program — its own BatchRenderer with a device-pinned
        chunk arena and the RLE readback — over its stable tile shard
        (see _dev_idx).  The reference's analogous scaling is a
        thread-per-core pool running its real serving loop
        (http_server.rs:50-116); this is that model per accelerator,
        with no cross-chip communication."""
        import time as _time

        import jax

        n_tiles = len(tiles_entities)
        by_dev: Dict[int, List[int]] = {}
        for i, (_, t) in enumerate(tiles_entities):
            by_dev.setdefault(self._dev_idx(t), []).append(i)
        needs_cpu: set = set()
        device_labeled: set = set()
        staged = []
        for d, idxs in by_dev.items():
            r = self.batch_renderers[d]
            prep = r.prepare(
                [tiles_entities[i] for i in idxs], scale,
                label_layers=(
                    [compacts[i] for i in idxs] if compacts is not None else None
                ),
            )
            needs_cpu.update(idxs[f] for f in getattr(prep, "cpu_fallback_tiles", ()))
            device_labeled.update(
                idxs[f] for f in getattr(prep, "device_labeled", ())
            )
            staged.append((r, idxs, prep))
        prep_dt = _time.perf_counter() - t_prep0
        results = [
            (r, idxs, r.render_prepared_rle(p)) for r, idxs, p in staged
        ]
        t0 = _time.perf_counter()
        jax.block_until_ready([res.wire for _, _, res in results])
        exec_dt = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        ts = 256 * scale
        remap = {}
        shard_views = []
        for r, idxs, res in results:
            view = r.fetch_tile_view(res)
            shard_views.append(view)
            for j, i in enumerate(idxs):
                remap[i] = (len(shard_views) - 1, j)
        d2h_dt = _time.perf_counter() - t0
        return (
            _ShardedTileView(shard_views, remap, n_tiles, ts),
            needs_cpu, prep_dt, exec_dt, d2h_dt, device_labeled,
        )

    def render_tiles_device(self, requests: List[Tuple[Tile, int]]) -> List[bytes]:
        """Batched device render; one dispatch per scale group.

        Oversize fills, out-of-bound coordinates and tiled fill-image
        fills draw on the device path (host-layer / pattern chunks);
        tiles fall back to the CPU oracle only when the device batch
        cannot represent them (e.g. icon fills without a stylesheet dir,
        or the jnp backend).
        """
        out: Dict[int, bytes] = {}
        by_scale: Dict[int, List[Tuple[int, Tile]]] = {}
        for i, (tile, scale) in enumerate(requests):
            by_scale.setdefault(scale, []).append((i, tile))
        import time as _time

        for scale, group in by_scale.items():
            t0 = _time.perf_counter()
            # Entity fetch is skipped when both the chunk-stream cache
            # and (if labels are on) the label-layer cache hit.
            def _need_entities(t: Tile) -> bool:
                if self.batch_renderer is None:
                    return True
                r = self.batch_renderers[self._dev_idx(t)]
                if not r.has_cached_chunks(t, scale):
                    return True
                return self.labeler is not None and not self.labeler.has_cached_layer(
                    t, 256 * scale
                )

            tiles_entities = [
                (
                    self.reader.get_entities_in_tile_with_neighbors(t, self.osm_ids)
                    if _need_entities(t)
                    else None,
                    t,
                )
                for _, t in group
            ]
            # Committed label layers, decided per tile BEFORE dispatch:
            # the device path composites them on-chip (label slab), so
            # the encode stage needs only the labeled/unlabeled verdict.
            compacts = None
            if self.labeler is not None and self.batch_renderer is not None:
                compacts = []
                for gi, (entities, t) in enumerate(tiles_entities):
                    if entities is None and not self.labeler.has_cached_layer(
                        t, 256 * scale
                    ):
                        # Evicted between the _need_entities check and
                        # now (earlier tiles of this batch inserted
                        # layers); re-fetch rather than crash.
                        entities = self.reader.get_entities_in_tile_with_neighbors(
                            t, self.osm_ids
                        )
                        tiles_entities[gi] = (entities, t)
                    compacts.append(
                        self.labeler.ensure_layer(
                            entities, t, float(scale), self.styler,
                            256 * scale,
                        )
                    )
            ent_dt = _time.perf_counter() - t0
            n = len(group)
            # Cold-heavy groups stream in sub-batches: host assembly of
            # sub-batch N+1 overlaps the device render + readback of
            # sub-batch N (single accelerator; multi-device groups are
            # already split per chip and keep the one-shot path).
            n_uncached = sum(1 for e, _ in tiles_entities if e is not None)
            single_dev = len(getattr(self, "devices", None) or [None]) <= 1
            if (
                single_dev
                and n > self.COLD_SUB
                and 2 * n_uncached > self.COLD_SUB
            ):
                bounds = list(range(0, n, self.COLD_SUB)) + [n]
                subs = [slice(a, b) for a, b in zip(bounds, bounds[1:])]
            else:
                subs = [slice(0, n)]

            inflight = None
            for sl in subs + [None]:
                pending = None
                if sl is not None:
                    t0 = _time.perf_counter()
                    sub_compacts = compacts[sl] if compacts is not None else None
                    try:
                        if single_dev:
                            pending = (
                                "dispatched",
                                self._dispatch_group_device(
                                    tiles_entities[sl], scale, t0,
                                    sub_compacts,
                                ),
                            )
                        else:
                            pending = (
                                "done",
                                self._render_group_multi(
                                    tiles_entities[sl], scale, t0,
                                    sub_compacts,
                                ),
                            )
                    except ValueError as e:
                        pending = ("err", _time.perf_counter() - t0, str(e))
                if inflight is not None:
                    psl, pp = inflight
                    if pp[0] == "dispatched":
                        res = self._collect_group_device(pp[1])
                    elif pp[0] == "done":
                        res = pp[1]
                    elif single_dev and "MAX_BATCH_CHUNKS" in pp[2]:
                        # Chunk-dense sub-batch overflowed the kernel's
                        # SMEM scalar-prefetch bound: halve and retry on
                        # the device (the failed prepare already filled
                        # the chunk cache, so the halves concat warm)
                        # instead of falling back to per-tile CPU.
                        self._encode_split_sub(
                            group[psl], tiles_entities[psl], scale, out,
                            ent_dt / n,
                            compacts[psl] if compacts is not None else None,
                        )
                        inflight = (sl, pending) if sl is not None else None
                        continue
                    else:
                        res = (
                            None,
                            set(range(psl.stop - psl.start)),
                            pp[1],
                            None,
                            None,
                            set(),
                        )
                    self._encode_sub(
                        group[psl], tiles_entities[psl], scale, out,
                        ent_dt / n,
                        compacts[psl] if compacts is not None else None,
                        *res,
                    )
                inflight = (sl, pending) if sl is not None else None
        return [out[i] for i in range(len(requests))]

    def _encode_split_sub(
        self, sub_group, sub_te, scale, out, ent_share, sub_compacts
    ) -> None:
        """Render a chunk-dense sub-batch by recursive halving: each
        half dispatches + collects + encodes synchronously, halving
        again if it still exceeds MAX_BATCH_CHUNKS.  A single tile that
        alone overflows the bound (not observed in practice; it would
        need ~8k distinct primitives in one tile) falls back to the
        CPU oracle, preserving output."""
        import time as _time

        n = len(sub_group)
        if n == 1:
            self._encode_sub(
                sub_group, sub_te, scale, out, ent_share, sub_compacts,
                None, {0}, 0.0, None, None, set(),
            )
            return
        mid = n // 2
        for sl in (slice(0, mid), slice(mid, n)):
            sc = sub_compacts[sl] if sub_compacts is not None else None
            t0 = _time.perf_counter()
            try:
                pending = self._dispatch_group_device(
                    sub_te[sl], scale, t0, sc
                )
                res = self._collect_group_device(pending)
            except ValueError as e:
                if "MAX_BATCH_CHUNKS" not in str(e):
                    raise
                self._encode_split_sub(
                    sub_group[sl], sub_te[sl], scale, out, ent_share, sc
                )
                continue
            self._encode_sub(
                sub_group[sl], sub_te[sl], scale, out, ent_share, sc, *res
            )

    def _encode_sub(
        self, sub_group, sub_te, scale, out, ent_share, sub_compacts,
        view, needs_cpu, prep_dt, exec_dt, d2h_dt, device_labeled,
    ) -> None:
        n = len(sub_group)
        for gi, ((i, t), (entities, _)) in enumerate(zip(sub_group, sub_te)):
            # Per-tile perf accounting: one fused kernel renders the
            # whole sub-batch, so device phases are attributed as equal
            # shares — but measured per phase (execute = dispatch ->
            # block_until_ready on the device array; readback =
            # device->host transfer), not as one wall-clock lump.
            perfstats.start_tile(t.zoom)
            perfstats.add_span("Get tile entities (batch share)", ent_share)
            perfstats.add_span("Prepare device batch (batch share)", prep_dt / n)
            if exec_dt is not None and d2h_dt is not None:
                perfstats.add_span("Device execute (batch share)", exec_dt / n)
                perfstats.add_span("Device readback (batch share)", d2h_dt / n)

            with perfstats.measure("Compose and encode"):
                if gi in needs_cpu or view is None:
                    if entities is None:
                        entities = self.reader.get_entities_in_tile_with_neighbors(
                            t, self.osm_ids
                        )
                    img = self._cpu_drawer().draw_to_pixels(
                        entities, t, scale, self.styler
                    )
                    out[i] = rgb_to_png(img, self.png_level)
                else:
                    compact = (
                        sub_compacts[gi] if sub_compacts is not None else None
                    )
                    png = None
                    if compact is None or gi in device_labeled:
                        # Unlabeled tiles — and device-labeled ones,
                        # whose labels the render jit already blitted —
                        # emit PNG-8 straight from the indexed wire
                        # when the tile's colors fit the (literal-
                        # extended) palette; the wire's palette IS a
                        # PLTE (1/3 the encoder stream, smaller PNGs).
                        png = view.png8(gi, self.png_level)
                    if png is None:
                        img = view.rgb(gi)
                        if compact is not None and gi not in device_labeled:
                            # Host composite: non-arena batches (no
                            # label slab) keep the round-4 path.
                            img = self.labeler.composite_labels(
                                img, entities, t, float(scale), self.styler
                            )
                        png = rgb_to_png(img, self.png_level)
                    out[i] = png
            self._png_cache_put(t, scale, out[i])
            with self._perf_lock:
                perfstats.finish_tile(self.perf_stats)


async def run_server(
    address: str,
    service: TileService,
    batch_window_ms: float = 5.0,
    max_batch: int = 32,
) -> None:
    host, _, port_str = address.rpartition(":")
    port = int(port_str)
    shutdown_event = asyncio.Event()
    loop = asyncio.get_running_loop()

    batch_queue: asyncio.Queue = asyncio.Queue()

    async def batcher():
        while True:
            item = await batch_queue.get()
            items = [item]
            try:
                deadline = loop.time() + batch_window_ms / 1e3
                while len(items) < max_batch:
                    timeout = deadline - loop.time()
                    if timeout <= 0:
                        break
                    items.append(await asyncio.wait_for(batch_queue.get(), timeout))
            except asyncio.TimeoutError:
                pass
            reqs = [(t, s) for (t, s, _) in items]
            try:
                pngs = await asyncio.to_thread(service.render_tiles_device, reqs)
                for (_, _, fut), png in zip(items, pngs):
                    if not fut.done():
                        fut.set_result(png)
            except Exception as e:  # pragma: no cover
                for (_, _, fut) in items:
                    if not fut.done():
                        fut.set_exception(e)

    batcher_task = asyncio.create_task(batcher()) if service.backend == "device" else None

    async def handle(reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            first_line = await reader.readline()
            tokens = first_line.decode("latin-1").strip().split(" ")
            if len(tokens) != 3 or tokens[0] != "GET" or tokens[2] not in (
                "HTTP/1.1",
                "HTTP/1.0",
            ):
                return
            path = tokens[1]

            if path == "/shutdown":
                shutdown_event.set()
                await _respond(writer, b"shutting down\n", "text/plain")
                return
            if path == "/perf_stats":
                with service._perf_lock:
                    html = service.perf_stats.to_html()
                await _respond(writer, html.encode(), "text/html")
                return

            parsed = extract_tile_from_path(path)
            if parsed is None:
                await _respond(writer, b"not a tile\n", "text/plain", status="404 Not Found")
                return
            tile, scale = parsed
            cached = service.png_cache_get(tile, scale)
            if cached is not None:
                await _respond(writer, cached, "image/png")
                return
            if service.backend == "device":
                fut = loop.create_future()
                await batch_queue.put((tile, scale, fut))
                png = await fut
            else:
                png = await asyncio.to_thread(service.render_tile_cpu, tile, scale)
            await _respond(writer, png, "image/png")
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    server = await asyncio.start_server(handle, host or "127.0.0.1", port)
    try:
        await shutdown_event.wait()
    finally:
        if batcher_task:
            batcher_task.cancel()
        server.close()
        await server.wait_closed()


async def _respond(writer, data: bytes, content_type: str, status: str = "200 OK"):
    header = (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(data)}\r\n"
        "Access-Control-Allow-Origin: *\r\n"
        "Connection: close\r\n"
        "\r\n"
    ).encode()
    writer.write(header + data)
    await writer.drain()
