"""Batched device rendering with optional multi-chip tile sharding.

`BatchRenderer` turns per-tile entity sets into padded chunk-stream
batches and dispatches them to the device renderer.  Scaling follows
the framework's parallelism model (the analogue of the reference's
thread-per-core request parallelism, `http_server.rs:50-83`): **tile
data parallelism** — the batch axis is sharded across a
`jax.sharding.Mesh` of chips over ICI, with no cross-tile
communication; optionally the pixel-row axis can be sharded too
("spatial" parallelism for large @2x tiles).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osm_renderer_tpu.core.tile import Tile
from osm_renderer_tpu.draw import primitives as prim_mod
from osm_renderer_tpu.draw.primitives import FillPrim, assemble_tile_prims
from osm_renderer_tpu.mapcss.styler import Styler
from osm_renderer_tpu.ops.render_jnp import TileBatch, render_batch

from osm_renderer_tpu.draw.primitives import FAST_COORD_BOUND  # noqa: F401 (re-export)


class RleRendered(NamedTuple):
    """A rendered batch with device-side RLE readback (warm-serving path).

    `planar` stays device-resident; only the packed `wire` buffer
    (ops/rle.py encode_batch_wire — one int32 per run, batch-wide)
    crosses the slow tunnel d2h link.  If the batch's total run count
    overflows the wire capacity, the caller falls back to fetching the
    raw planar output."""
    planar: jax.Array   # (T, 4, ts, ts) u8, device-resident
    wire: jax.Array     # v1: (2 + T + rtot,) i32; v2: indexed-word wire
    ts: int
    rtot: int           # v1: run cap; v2: word cap
    fmt: str = "v1"     # "v2" = indexed-color 16-bit-word wire


class PreparedBatch(NamedTuple):
    batch: object
    canvas_rgb: jax.Array
    ts: int
    chunk: int  # chunk size (jnp) / n_tiles (pallas)
    precision: str
    cpu_fallback_tiles: tuple = ()  # tile indices the device path can't draw
    chain: bool = False  # jnp: round-capped dashes need the walk-chain rule
    # Arena path (parallel/arena.py): batch == None; the packed
    # small-field buffer is the only per-batch h2d upload, and the big
    # chunk fields are gathered from the device-resident arena.
    arena_packed: object = None        # (N_SMALL, C) i32 np buffer
    arena_it: int = 0                  # bucketed item width
    arena_ctx: object = None           # (arena, prof_dev, tot_dev, pat_dev)
    # Device label blit (parallel/label_slab.py): slab-row map appended
    # to the packed upload; labeled tiles come back with their committed
    # label layers already composited on device.
    label_rows: object = None          # (T, 3) i32 (off, y0, n) or None
    label_ctx: object = None           # (slab, slab.generation)
    device_labeled: tuple = ()         # tile indices blitted on device


class BatchRenderer:
    """backend="pallas" (TPU kernel, default), "jnp" (pure-XLA reference).

    precision applies to the jnp backend: "fast" (f32/int32) or "exact"
    (f64/int64, requires x64).  The pallas backend is always f32/int32
    under the same coordinate bound.
    """

    def __init__(
        self,
        styler: Styler,
        precision: str = "fast",
        chunk_size: int = 64,
        mesh: Optional[Mesh] = None,
        backend: str = "pallas",
        interpret: bool = False,
        stylesheet_dir: Optional[str] = None,
        tile_bucket: bool = False,
        chunk_cache_tiles: int = 0,
        arena: bool = False,
        device=None,
        indexed_wire: bool = True,
    ):
        # `device`: pin every resident array (arena, profile/pattern
        # tables, canvas, prepared batches) to one accelerator, so
        # multi-chip serving runs N independent copies of the
        # single-chip program — one BatchRenderer per chip (the
        # committed inputs route each jit execution to its chip).
        self.device = device
        self.styler = styler
        self.precision = precision
        self.chunk_size = chunk_size
        self.mesh = mesh
        self.backend = backend
        self.interpret = interpret
        # Bucket the tile-batch axis to powers of two so serving with
        # varying request-batch sizes reuses a handful of compiled
        # kernel signatures (n_tiles is static for the pallas call).
        self.tile_bucket = tile_bucket
        # LRU cache of per-tile device-ready chunk arrays (pallas
        # backend): a slippy server re-renders the same tiles
        # constantly, and on a hit batch prepare is pure concatenation
        # (no entity fetch, styling, projection or packing).  Requires
        # batch-stable pattern/profile indices, so the tables persist
        # per scale while the cache is on.
        self.chunk_cache_tiles = chunk_cache_tiles
        self._chunk_cache: "OrderedDict" = OrderedDict()
        # The server handles requests from multiple threads; OrderedDict
        # mutation is not thread-safe.
        self._cache_lock = threading.RLock()
        self._rtot_by_key: dict = {}      # (ts, T) -> adaptive RLE wire cap
        self._wtot_by_key: dict = {}      # (ts, T) -> adaptive indexed word cap
        # Adaptive serving palette (ops/rle.py indexed wire): learned
        # from the first v1 batch's run colors, relearned by demoting to
        # v1 for one batch when the literal fraction drifts too high.
        # Default ON since the Pallas expand kernel
        # (ops/rle_pallas.py encode_wire_indexed_pallas) made the v2
        # encode ~free: drift-controlled A/B on the 30-tile warm loop
        # measured wire payload 1.18 -> 0.80 MB and full warm cycle
        # 196 -> 172 ms (+2.9 ms encode, -28.9 ms fetch+decode).  The
        # XLA v2 encoder (only used in interpret mode) still costs
        # ~183 ms/30-tile batch of device time.
        self.indexed_wire = indexed_wire
        self._pal_table: Optional[np.ndarray] = None
        self._pal_dev = None
        self._pal_cooldown = 0  # v2 batches before a relearn may trigger
        self._persist_tables: dict = {}   # scale -> (ProfileTable, PatternTable)
        self._patterns_dev: dict = {}     # scale -> (n_tiles_in_table, jax.Array)
        self._profiles_dev: dict = {}     # scale -> (n_rows, rows_dev, tot_dev)
        self._canvas_dev: dict = {}       # dtype -> resident canvas array
        self._empty_chunks: dict = {}     # ts -> TileChunks (PAD-only)
        # Device-resident chunk arena: warm batches assemble on device
        # from one packed upload (see parallel/arena.py).  Pallas-only,
        # single-device, and tied to the chunk cache's lifecycle.
        self.chunk_arena = None
        if arena and backend == "pallas" and chunk_cache_tiles:
            from osm_renderer_tpu.parallel.arena import ChunkArena

            self.chunk_arena = ChunkArena(device=device)
        # Device label slabs (parallel/label_slab.py), one per tile
        # size; populated lazily when prepare() receives label layers.
        self._label_slabs: dict = {}
        self.icon_cache = None
        if stylesheet_dir is not None:
            from osm_renderer_tpu.draw.labels.icons import IconCache

            self.icon_cache = IconCache(stylesheet_dir)
        if backend == "pallas":
            # Eager import: pallas (and the native assembler) load at
            # construction — server/bench startup — not inside the first
            # prepare(), which would otherwise charge ~1 s of one-time
            # module imports to the first request's cold-assembly time.
            from osm_renderer_tpu.draw import native_assembler as _na  # noqa: F401
            from osm_renderer_tpu.ops import render_pallas as _rp  # noqa: F401

            _na.get_native()

    def prepare(
        self, tiles_entities: Sequence[Tuple[object, Tile]], scale: int = 1,
        label_layers: Optional[Sequence] = None,
    ) -> PreparedBatch:
        """label_layers: optional per-tile compact committed label
        layers (labeler.ensure_layer results, None = unlabeled).  On
        the arena path labeled tiles are composited ON DEVICE (see
        PreparedBatch.device_labeled); elsewhere the hint is ignored
        and callers keep the host composite."""
        if self.backend == "pallas":
            return self._prepare_pallas(tiles_entities, scale, label_layers)
        dtype = np.float32 if self.precision == "fast" else np.float64
        profiles = prim_mod.ProfileTable()
        patterns = prim_mod.PatternTable(self.icon_cache, 256 * scale)
        all_prims = []
        chunk = self.chunk_size
        for entities, tile in tiles_entities:
            prims = assemble_tile_prims(entities, tile, float(scale), self.styler)
            all_prims.append(prims)
            max_fill = max(
                (p.edges.shape[0] for p in prims if isinstance(p, FillPrim)), default=0
            )
            while chunk < max_fill:
                chunk *= 2
        streams = [
            prim_mod.stream_tile(prims, profiles, chunk, patterns)
            for prims in all_prims
        ]
        fallback = tuple(
            i for i, st in enumerate(streams) if st.has_icon_fills
        )
        batch = prim_mod.build_batch(
            streams, profiles, chunk, dtype=dtype, patterns=patterns, ts=256 * scale
        )

        if self.precision == "fast":
            self._check_coords(batch.geom)

        batch = TileBatch(*(jnp.asarray(a) for a in batch))
        if self.mesh is not None:
            batch = self._shard(batch)
        return PreparedBatch(
            batch, self._canvas(dtype), 256 * scale, chunk, self.precision,
            fallback, profiles.has_round_caps(),
        )

    def _dev(self, a):
        """Place an array on this renderer's device (committed) or the
        default device when unpinned."""
        if self.device is not None:
            import jax

            return jax.device_put(a, self.device)
        return jnp.asarray(a)

    def _canvas(self, dtype):
        # Per-styler constant: upload once, not once per batch (every
        # h2d transfer pays ~ms of fixed latency on tunnel hosts).
        got = self._canvas_dev.get(dtype)
        if got is not None:
            return got
        canvas = self.styler.canvas_fill_color
        canvas_rgb = np.array(
            [canvas.r, canvas.g, canvas.b] if canvas is not None else [0, 0, 0],
            dtype=dtype,
        ) / 255.0
        dev = self._dev(canvas_rgb)
        self._canvas_dev[dtype] = dev
        return dev

    def _check_coords(self, geom) -> None:
        max_coord = int(np.abs(geom).max()) if geom.size else 0
        if max_coord >= FAST_COORD_BOUND:
            raise ValueError(
                f"fast (int32) path requires |coords| < {FAST_COORD_BOUND}, "
                f"got {max_coord}; use precision='exact' with backend='jnp'"
            )

    def _tables_for(self, scale: int):
        """Per-scale (ProfileTable, PatternTable) — fresh per batch
        without the chunk cache, persistent (index-stable) with it."""
        if not self.chunk_cache_tiles:
            return (
                prim_mod.ProfileTable(),
                prim_mod.PatternTable(self.icon_cache, 256 * scale),
            )
        got = self._persist_tables.get(scale)
        if got is None:
            got = (
                prim_mod.ProfileTable(),
                prim_mod.PatternTable(self.icon_cache, 256 * scale),
            )
            self._persist_tables[scale] = got
        return got

    def has_cached_chunks(self, tile: Tile, scale: int) -> bool:
        with self._cache_lock:
            return (tile.zoom, tile.x, tile.y, scale) in self._chunk_cache

    def cache_clear(self) -> None:
        with self._cache_lock:
            self._chunk_cache.clear()
            self._persist_tables.clear()
            self._patterns_dev.clear()
            self._profiles_dev.clear()
            if self.chunk_arena is not None:
                self.chunk_arena.clear()
            for slab in self._label_slabs.values():
                slab.clear()

    # Host-rasterized layers (out-of-bound prims) accumulate in a
    # persistent pattern table as their tiles churn through the cache;
    # past this bound both are rebuilt from scratch.
    MAX_PERSISTED_PATTERNS = 48

    # Scalar-prefetch SMEM bound: one pallas batch may not exceed this
    # many chunks (compile fails around ~10k on v5e).
    MAX_BATCH_CHUNKS = 8192

    def _prepare_pallas(
        self, tiles_entities, scale: int, label_layers=None
    ) -> PreparedBatch:
        from osm_renderer_tpu.ops import render_pallas as RP

        ts_px = 256 * scale
        profiles, patterns = self._tables_for(scale)
        tile_chunks = []
        tile_keys = []
        fallback = []
        cache_on = bool(self.chunk_cache_tiles)
        for idx, (entities, tile) in enumerate(tiles_entities):
            key = (tile.zoom, tile.x, tile.y, scale)
            tile_keys.append(key)
            if cache_on:
                with self._cache_lock:
                    hit = self._chunk_cache.get(key)
                    if hit is not None:
                        self._chunk_cache.move_to_end(key)
                if hit is not None:
                    chunks, has_icon_fills = hit
                    if has_icon_fills:
                        fallback.append(idx)
                    tile_chunks.append(chunks)
                    continue
            if entities is None:
                raise ValueError(f"no cached chunks and no entities for {tile}")
            # Native (C++) assembly when available — exact transcription
            # of the Python pipeline (tests/test_native_assembler.py);
            # the cold-serving bottleneck is per-primitive Python time.
            from osm_renderer_tpu.draw.native_assembler import (
                assemble_tile_chunks_native,
            )

            got = assemble_tile_chunks_native(
                entities, tile, float(scale), self.styler, profiles,
                patterns, ts_px,
            )
            if got is not None:
                chunks, has_icon_fills = got
            else:
                prims = assemble_tile_prims(entities, tile, float(scale), self.styler)
                stream = prim_mod.stream_tile_packed(
                    prims, profiles, RP.CH, patterns
                )
                chunks = RP.build_tile_chunks(
                    stream, ts_px, profiles.chain_free_mask()
                )
                has_icon_fills = stream.has_icon_fills
            self._check_coords(chunks.geom)
            if has_icon_fills:
                fallback.append(idx)
            if cache_on:
                with self._cache_lock:
                    self._chunk_cache[key] = (chunks, has_icon_fills)
                    while len(self._chunk_cache) > self.chunk_cache_tiles:
                        ev_key, _ = self._chunk_cache.popitem(last=False)
                        if self.chunk_arena is not None:
                            self.chunk_arena.free(ev_key)
                if len(patterns.tiles) > self.MAX_PERSISTED_PATTERNS:
                    # The rest of this batch keeps rendering with the
                    # (still-consistent) local tables, but nothing more
                    # may enter the cache: entries built against the
                    # discarded tables would pair with the fresh
                    # ProfileTable/PatternTable of the next batch and
                    # dereference stale profile/pattern indices.
                    self.cache_clear()
                    cache_on = False
            tile_chunks.append(chunks)
        total_chunks = sum(int(c.kind.shape[0]) for c in tile_chunks)
        if total_chunks > self.MAX_BATCH_CHUNKS:
            # The kernel's scalar-prefetch arrays live in SMEM; past
            # ~8k chunks the Mosaic compile fails outright (observed at
            # 10240 on v5e).  Callers must split oversized batches —
            # the server's micro-batcher (max_batch) never gets here.
            raise ValueError(
                f"batch has {total_chunks} chunks > MAX_BATCH_CHUNKS "
                f"({self.MAX_BATCH_CHUNKS}); split the tile batch"
            )
        n_tiles = len(tiles_entities)
        if self.tile_bucket:
            from osm_renderer_tpu.utils.jax_setup import next_pow2

            bucket = next_pow2(max(n_tiles, 4), 4)
            empty = self._empty_chunks.get(ts_px)
            if empty is None:
                empty = RP.build_tile_chunks(prim_mod.TileStream(), ts_px)
                self._empty_chunks[ts_px] = empty
            while len(tile_chunks) < bucket:
                tile_chunks.append(empty)
                tile_keys.append(("__pad__", ts_px))
            n_tiles = bucket
        if self.chunk_arena is not None and cache_on:
            try:
                return self._finalize_arena(
                    tile_chunks, tile_keys, profiles, patterns, ts_px,
                    n_tiles, fallback, scale, label_layers,
                )
            except MemoryError:
                # Arena exhausted: rebuild lazily; this batch takes the
                # plain upload path.
                self.chunk_arena.clear()
        pb = RP.concat_pallas_batch(tile_chunks, profiles, ts_px, patterns)

        # Ship the (potentially multi-MB) pattern planes once per table
        # version, not once per batch.
        pat_dev = None
        if cache_on:
            ver = len(patterns.tiles)
            got = self._patterns_dev.get(scale)
            if got is not None and got[0] == ver:
                pat_dev = got[1]
            else:
                pat_dev = self._dev(pb.patterns)
                self._patterns_dev[scale] = (ver, pat_dev)
        if pat_dev is not None:
            # Already-resident device array; jnp.asarray below is a no-op.
            pb = pb._replace(patterns=pat_dev)
        pb = RP.PallasBatch(*(self._dev(a) for a in pb))
        return PreparedBatch(
            pb, self._canvas(np.float32), ts_px, n_tiles, "pallas",
            tuple(fallback),
        )

    def _finalize_arena(
        self, tile_chunks, tile_keys, profiles, patterns, ts_px,
        n_tiles, fallback, scale, label_layers=None,
    ) -> PreparedBatch:
        """Arena-path batch finalize: insert fresh tiles' big chunk
        fields into the device arena (one upload), pack the per-chunk
        scalars + gather rows into the small host buffer.  Labeled
        tiles additionally get their committed label layers staged in
        the device label slab and a slab-row map appended to the packed
        upload (the render jit blits them — no host compositing)."""
        from osm_renderer_tpu.ops import render_pallas as RP

        arena = self.chunk_arena
        arena.insert(list(zip(tile_keys, tile_chunks)))
        offsets = [arena.offset(k) for k in tile_keys]
        packed, it_width = RP.pack_small_arena(tile_chunks, offsets)

        label_rows = label_ctx = None
        device_labeled: tuple = ()
        if label_layers is not None and any(
            c is not None for c in label_layers
        ):
            labeled = [
                (ti, tile_keys[ti], compact)
                for ti, compact in enumerate(label_layers)
                if compact is not None and ti not in fallback
            ]
            if labeled:
                slab = self._label_slab(ts_px)
                try:
                    slab.insert([(k, c) for _, k, c in labeled])
                except MemoryError:
                    slab.clear()
                    slab.insert([(k, c) for _, k, c in labeled])
                label_rows = slab.ltriples(
                    n_tiles, [(ti, k) for ti, k, _ in labeled]
                )
                label_ctx = (slab, slab.generation)
                device_labeled = tuple(ti for ti, _, _ in labeled)

        ver = len(profiles.rows)
        got = self._profiles_dev.get(scale)
        if got is None or got[0] != ver:
            rows, tots = profiles.arrays(np.float32)
            got = (ver, self._dev(rows), self._dev(tots))
            self._profiles_dev[scale] = got
        _, prof_dev, tot_dev = got

        pver = len(patterns.tiles)
        gp = self._patterns_dev.get(scale)
        if gp is None or gp[0] != pver:
            if patterns.tiles:
                pat_arr = patterns.array()
            else:
                pat_arr = np.zeros((1, 4, ts_px, ts_px), dtype=np.float32)
            gp = (pver, self._dev(pat_arr))
            self._patterns_dev[scale] = gp

        return PreparedBatch(
            None, self._canvas(np.float32), ts_px, n_tiles, "pallas",
            tuple(fallback), arena_packed=packed, arena_it=it_width,
            arena_ctx=(arena, prof_dev, tot_dev, gp[1], arena.generation),
            label_rows=label_rows, label_ctx=label_ctx,
            device_labeled=device_labeled,
        )

    def _label_slab(self, ts_px: int):
        got = self._label_slabs.get(ts_px)
        if got is None:
            from osm_renderer_tpu.parallel.label_slab import LabelSlab

            got = self._label_slabs[ts_px] = LabelSlab(
                ts_px, device=self.device
            )
        return got

    def _shard_pallas(self, pb):
        # Chunk streams interleave tiles, so dp-sharding the pallas batch
        # would need per-device chunk partitioning; multi-chip serving
        # instead dispatches separate per-device batches (see
        # MeshTileRenderer). Left unsharded here.
        return pb

    def _shard(self, batch: TileBatch) -> TileBatch:
        mesh = self.mesh
        dp = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        sharded = []
        for name, arr in zip(TileBatch._fields, batch):
            if name in ("profiles", "profile_total", "patterns"):
                sharded.append(jax.device_put(arr, rep))
            else:
                sharded.append(jax.device_put(arr, dp))
        return TileBatch(*sharded)

    def render_prepared(self, prepared: PreparedBatch) -> jax.Array:
        if prepared.precision == "pallas":
            if prepared.arena_packed is not None:
                out = self.render_prepared_planar(prepared)
                return out[:, :3].transpose(0, 2, 3, 1)
            from osm_renderer_tpu.ops.render_pallas import render_batch_pallas

            return render_batch_pallas(
                prepared.batch, prepared.canvas_rgb, prepared.ts,
                prepared.chunk, self.interpret,
            )
        return render_batch(
            prepared.batch,
            prepared.canvas_rgb,
            prepared.ts,
            prepared.chunk,
            prepared.precision,
            chain=getattr(prepared, "chain", False),
        )

    def render(
        self, tiles_entities: Sequence[Tuple[object, Tile]], scale: int = 1
    ) -> np.ndarray:
        return np.asarray(self.render_prepared(self.prepare(tiles_entities, scale)))

    def render_prepared_planar(self, prepared: PreparedBatch) -> jax.Array:
        """Pallas backend: (T, 4, ts, ts) u8 without the device-side
        interleave (the kernel's native output layout)."""
        assert prepared.precision == "pallas"
        if prepared.arena_packed is not None:
            from osm_renderer_tpu.ops.render_pallas import (
                render_arena_planar,
                render_arena_planar_labeled,
            )

            arena, prof_dev, tot_dev, pat_dev, gen = prepared.arena_ctx
            if gen != arena.generation:
                # The arena was cleared between prepare and render (cache
                # reset); offsets are stale.  ValueError routes the server
                # to its per-batch CPU fallback; bench/tests re-prepare.
                raise ValueError("chunk arena reset between prepare and render")
            if prepared.label_rows is not None:
                slab, sgen = prepared.label_ctx
                if sgen != slab.generation:
                    raise ValueError(
                        "label slab reset between prepare and render"
                    )
                combined = np.concatenate(
                    [
                        prepared.arena_packed.reshape(-1),
                        prepared.label_rows.reshape(-1),
                    ]
                )
                return render_arena_planar_labeled(
                    self._dev(combined), arena, prof_dev, tot_dev,
                    pat_dev, prepared.canvas_rgb, prepared.ts,
                    prepared.chunk, prepared.arena_it, slab.plane,
                    self.interpret,
                )
            # Committed upload: device-pinned renderers send the packed
            # buffer straight to their chip (everything else in the call
            # is already arena-resident there).
            return render_arena_planar(
                self._dev(prepared.arena_packed), arena, prof_dev, tot_dev,
                pat_dev, prepared.canvas_rgb, prepared.ts, prepared.chunk,
                prepared.arena_it, self.interpret,
            )
        from osm_renderer_tpu.ops.render_pallas import render_batch_pallas_planar

        return render_batch_pallas_planar(
            prepared.batch, prepared.canvas_rgb, prepared.ts,
            prepared.chunk, self.interpret,
        )

    def _pick_rtot(self, ts: int, T: int) -> int:
        """Wire capacity (total runs) for a (tile-size, batch-size)
        signature: adapted from the last observed total, generous cold
        default (overflow costs one raw-planar batch fetch)."""
        from osm_renderer_tpu.ops.render_pallas import next_bucket

        got = self._rtot_by_key.get((ts, T))
        if got is not None:
            return got
        return next_bucket(T * 12 * 1024, 4096)

    def _note_total_runs(self, ts: int, T: int, total: int) -> None:
        from osm_renderer_tpu.ops.render_pallas import next_bucket

        want = next_bucket(max(int(total * 1.25), T * 1024), 4096)
        cur = self._rtot_by_key.get((ts, T))
        # Hysteresis: every distinct cap is a fresh encode-graph compile
        # (seconds), while an oversized wire only pads the d2h by one
        # bucket step (~12%).  Grow monotonically; shrink only on a
        # clear regime change (>= 2x smaller).
        if cur is not None and want <= cur and want * 2 > cur:
            return  # within one doubling below the current cap: keep it
        self._rtot_by_key[(ts, T)] = want

    def _pick_wtot(self, ts: int, T: int) -> int:
        """Indexed-wire word capacity (16-bit words, stored as i32
        pairs) for a signature; seeded from the observed run cap when
        available (words ~= runs x 1.1-1.5 at typical palette hit
        rates)."""
        from osm_renderer_tpu.ops.render_pallas import next_bucket

        got = self._wtot_by_key.get((ts, T))
        if got is not None:
            return got
        seed = self._rtot_by_key.get((ts, T))
        if seed is not None:
            return next_bucket(seed * 2, 8192)
        return next_bucket(T * 16 * 1024, 8192)

    def _note_total_words(self, ts: int, T: int, total: int) -> None:
        from osm_renderer_tpu.ops.render_pallas import next_bucket

        want = next_bucket(max(int(total * 1.25), T * 2048), 8192)
        cur = self._wtot_by_key.get((ts, T))
        if cur is not None and want <= cur and want * 2 > cur:
            return
        self._wtot_by_key[(ts, T)] = want

    def render_prepared_rle(
        self, prepared: PreparedBatch, rtot: Optional[int] = None
    ) -> RleRendered:
        """Pallas backend only: render, then RLE-encode on device.

        Two launches (render kernel, encode graph) — kept as separate
        jits so adapting the wire capacity never re-triggers a Mosaic
        kernel compile.  Once a serving palette is learned (from the
        first v1 batch), batches ship on the indexed-color wire (v2,
        ~1.5-1.7x fewer d2h bytes at measured palette coverage)."""
        assert prepared.precision == "pallas"
        from osm_renderer_tpu.ops import rle as rle_mod

        T = prepared.chunk  # n_tiles (pallas)
        planar = self.render_prepared_planar(prepared)
        if self._pal_dev is not None and rtot is None:
            wcap = self._pick_wtot(prepared.ts, T)
            if not self.interpret:
                # Pallas expand kernel: the XLA v2 encoder's word
                # compaction cost ~183 ms/30-tile batch of device time
                # (why the indexed wire used to be opt-in); the kernel
                # emits bit-identical words for ~1-2 ms.
                from osm_renderer_tpu.ops import rle_pallas

                wire = rle_pallas.encode_wire_indexed_pallas_device(
                    planar, wcap, self._pal_dev
                )
            else:
                wire = rle_mod.encode_wire_indexed_device(
                    planar, wcap, self._pal_dev
                )
            return RleRendered(planar, wire, prepared.ts, wcap, "v2")
        cap = int(rtot) if rtot is not None else self._pick_rtot(prepared.ts, T)
        if not self.interpret:
            # Pallas emit kernel: ~8x less device time than the XLA
            # gather-based compaction (67 -> 8.4 ms per 30-tile batch,
            # profiled round 4) for bit-identical wire bytes.
            from osm_renderer_tpu.ops import rle_pallas

            wire = rle_pallas.encode_wire_pallas_device(planar, cap)
        else:
            wire = rle_mod.encode_wire_device(planar, cap)
        return RleRendered(planar, wire, prepared.ts, cap)

    def fetch_tile_view(self, res: RleRendered) -> "RleTileView":
        """Host fetch of the compressed readback as a lazy per-tile
        view: tiles decode to RGB on demand, and v2 (indexed-wire)
        tiles can skip RGB entirely and emit a palette PNG straight
        from the word stream (`RleTileView.png8`).  Falls back to the
        raw planar fetch when the batch overflowed the wire capacity
        (and grows the next cap)."""
        from osm_renderer_tpu.ops.render_pallas import planar_to_rgb
        from osm_renderer_tpu.ops import rle as rle_mod

        wire = np.asarray(res.wire)
        T = int(wire[0])
        total = int(wire[1])
        ts = res.ts
        if res.fmt == "v2":
            total_runs = int(wire[2])
            if total > res.rtot:
                # Overflow: the Pallas emitter's word total is computed
                # from whatever packed-run bits fit the buffer, so it can
                # overstate the true need ~3x; seeding the next wcap from
                # it would pad every subsequent d2h transfer until the
                # shrink hysteresis corrects it.  A run emits at most 3
                # words, so 3*total_runs is a sound bound.
                self._note_total_words(
                    ts, T, min(total, 3 * max(total_runs, 1))
                )
                return RleTileView(
                    T, ts, rgb=planar_to_rgb(np.asarray(res.planar))
                )
            self._note_total_words(ts, T, total)
            n_words = wire[3 : 3 + T]
            table = wire[3 + T : 3 + T + rle_mod.PAL_CAP]
            packed32 = wire[3 + T + rle_mod.PAL_CAP :]
            offs = np.zeros(T + 1, np.int64)
            np.cumsum(n_words, out=offs[1:])
            # Palette drift: too many literal escapes -> relearn by
            # demoting the next batch to v1 (its fetch rebuilds the
            # table from full run colors).  Cooldown-gated: a corpus
            # whose tail colors genuinely exceed the palette would
            # otherwise thrash v1/v2 every batch (table re-upload +
            # graph flip per request).
            self._pal_cooldown -= 1
            lit_runs = (total - total_runs) // 2
            if (
                total_runs
                and lit_runs * 100 > total_runs * 45
                and self._pal_cooldown <= 0
            ):
                self._pal_table = None
                self._pal_dev = None
            return RleTileView(
                T, ts, words=(packed32, offs, table)
            )
        self._note_total_runs(ts, T, total)
        if total > res.rtot:
            return RleTileView(
                T, ts, rgb=planar_to_rgb(np.asarray(res.planar))
            )
        n_runs = wire[2 : 2 + T]
        packed = wire[2 + T :]
        offs = np.zeros(T + 1, np.int64)
        np.cumsum(n_runs, out=offs[1:])
        # Learn the serving palette from this batch's run colors; the
        # next batch ships indexed.
        if self.indexed_wire and self._pal_table is None and total > 0:
            runs = packed[:total]
            colors, counts = np.unique(runs & 0xFFFFFF, return_counts=True)
            self._pal_table = rle_mod.build_palette(colors, counts)
            self._pal_dev = self._dev(self._pal_table)
            self._pal_cooldown = 16
        return RleTileView(T, ts, runs=(packed, offs))

    def fetch_rgb_rle(self, res: RleRendered) -> np.ndarray:
        """Host fetch + decode of the compressed readback ->
        (T, ts, ts, 3) u8 (eager form of fetch_tile_view)."""
        view = self.fetch_tile_view(res)
        out = np.empty((view.T, view.ts, view.ts, 3), np.uint8)
        for i in range(view.T):
            out[i] = view.rgb(i)
        return out

    def render_rgb(self, prepared: PreparedBatch) -> np.ndarray:
        """Full batch to host RGB via the compressed readback."""
        return self.fetch_rgb_rle(self.render_prepared_rle(prepared))


class RleTileView:
    """Per-tile view of one fetched RLE wire.

    Exactly one of `rgb` (raw-fallback batch array), `words` (v2
    indexed 16-bit-word stream: packed32, word offsets, palette table)
    or `runs` (v1 packed runs: packed, run offsets) is set.  `rgb(i)`
    decodes tile i; `png8(i, level)` emits a palette PNG straight from
    the v2 word stream (None when the tile needs the RGB path)."""

    def __init__(self, T: int, ts: int, rgb=None, words=None, runs=None):
        self.T = T
        self.ts = ts
        self._rgb = rgb
        self._words = words
        self._runs = runs

    def rgb(self, i: int) -> np.ndarray:
        from osm_renderer_tpu.draw.png_writer import (
            rle_decode_packed,
            rle_decode_words,
        )

        if self._rgb is not None:
            return self._rgb[i]
        ts = self.ts
        if self._words is not None:
            packed32, offs, table = self._words
            return rle_decode_words(
                packed32, int(offs[i]), int(offs[i + 1] - offs[i]),
                table, ts, ts,
            )
        packed, offs = self._runs
        return rle_decode_packed(packed[int(offs[i]) : int(offs[i + 1])], ts, ts)

    def png8(self, i: int, level: int) -> Optional[bytes]:
        if self._words is None:
            return None
        from osm_renderer_tpu.draw.png_writer import words_to_png_pal

        packed32, offs, table = self._words
        return words_to_png_pal(
            packed32, int(offs[i]), int(offs[i + 1] - offs[i]),
            table, self.ts, self.ts, level,
        )


def pad_batch_to(tiles: int, prepared: PreparedBatch) -> PreparedBatch:
    """Pad the batch axis to a fixed size (stable jit signatures for serving)."""
    batch = prepared.batch
    T = batch.geom.shape[0]
    if T >= tiles:
        return prepared
    pad = tiles - T

    def pad0(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    new = TileBatch(
        *(
            a if name in ("profiles", "profile_total", "patterns") else pad0(a)
            for name, a in zip(TileBatch._fields, batch)
        )
    )
    return prepared._replace(batch=new)


class MeshTileRenderer:
    """Multi-chip tile data parallelism for the Pallas backend.

    Chunk streams interleave tiles, so instead of sharding one array set
    the batch is split into per-device sub-batches (round-robin over the
    mesh's devices), each prepared and dispatched by a device-pinned
    BatchRenderer — the full single-chip program per chip, including the
    arena when enabled — and gathered on the host. This is the scaling
    model of SURVEY §2 row 24: independent tile work, no cross-chip
    communication.
    """

    def __init__(self, styler: Styler, devices=None, **kwargs):
        import jax

        self.devices = list(devices) if devices is not None else jax.devices()
        self.renderers = [
            BatchRenderer(styler, backend="pallas", device=d, **kwargs)
            for d in self.devices
        ]
        # Back-compat alias (single-renderer callers/tests).
        self.renderer = self.renderers[0]

    def render(self, tiles_entities, scale: int = 1) -> np.ndarray:
        import jax

        n_dev = len(self.devices)
        shards = [tiles_entities[d::n_dev] for d in range(n_dev)]
        shards = [(r, s) for r, s in zip(self.renderers, shards) if s]

        outs = []
        for renderer, shard in shards:
            outs.append(renderer.render_prepared(renderer.prepare(shard, scale)))
        jax.block_until_ready(outs)

        T = len(tiles_entities)
        ts = 256 * scale
        result = np.empty((T, ts, ts, 3), dtype=np.uint8)
        out_iter = iter(outs)
        for d in range(n_dev):
            indices = list(range(d, T, n_dev))
            if not indices:
                continue
            arr = np.asarray(next(out_iter))
            for j, ti in enumerate(indices):
                result[ti] = arr[j]
        return result
