"""Device-resident chunk arena for the warm serving path.

On a tunnel-attached host the h2d link (~30 ms latency, ~25-50 MB/s)
dominates warm serving: re-uploading a 30-tile batch's chunk arrays
costs ~7.5 MB across ~17 transfers per request.  The arena keeps the
five *large* per-chunk fields (geom / trav / sprof / aux / items)
resident in HBM, keyed by cached tile; a warm batch then uploads ONE
small packed buffer (per-chunk scalars + gather indices, ~100 KB) and
the device assembles the batch itself with a row gather fused into the
render jit.

Reference analogue: none — the reference re-rasterizes from mmap'd
geodata every request (`drawer.rs:60-131`); this is the TPU-native
equivalent of its per-thread reusable TilePixels, applied to the
geometry stream instead of the pixel buffer.

Not thread-safe; callers serialize (BatchRenderer holds its cache lock
across prepare()).
"""

from __future__ import annotations

import functools
from bisect import insort
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from osm_renderer_tpu.ops.render_pallas import CH, IT_CAP

IT_ARENA = IT_CAP  # arena item width: every per-tile width fits


def _next_pow2(n: int, minimum: int) -> int:
    return max(minimum, 1 << (max(n, 1) - 1).bit_length())


class ChunkArena:
    """Slab-allocated device arrays of per-chunk rows.

    Row 0 is a reserved all-zero pad row (batch padding gathers it; its
    chunk kind is KIND_PAD in the packed small fields, so the kernel
    never reads the payload).
    """

    MAX_CAP = 65536  # 65k rows x ~13 KB/row ~= 850 MB HBM ceiling

    def __init__(self, min_cap: int = 4096, device=None):
        # `device`: pin the arena arrays (and the insert/grow jits that
        # consume them) to one accelerator — multi-chip serving runs one
        # arena per chip so every chip executes the same single-chip
        # program (committed inputs route the jit executions).
        self.device = device
        self.min_cap = min_cap
        self.cap = 0
        self.geom = None   # (cap, 4, CH) i32
        self.trav = None   # (cap, 1, CH) f32
        self.sprof = None  # (cap, 1, CH) i32
        self.aux = None    # (cap, 4, CH) f32
        self.items = None  # (cap, 1, IT_ARENA) i32
        self._offsets: Dict[object, Tuple[int, int]] = {}  # key -> (off, n)
        self._free: List[Tuple[int, int]] = []  # (off, n), sorted by off
        self._tail = 1  # row 0 reserved as the pad row
        self.generation = 0  # bumped on clear(); cached idx must match
        self._donate = jax.default_backend() == "tpu"

    # ---------------------------------------------------------- alloc --

    def __contains__(self, key) -> bool:
        return key in self._offsets

    def offset(self, key) -> Tuple[int, int]:
        return self._offsets[key]

    def free(self, key) -> None:
        got = self._offsets.pop(key, None)
        if got is None:
            return
        off, n = got
        insort(self._free, (off, n))
        self._coalesce_at(off)

    def _coalesce_at(self, off: int) -> None:
        i = next(
            (j for j, (o, _) in enumerate(self._free) if o == off), None
        )
        if i is None:
            return
        if i + 1 < len(self._free):
            o, n = self._free[i]
            o2, n2 = self._free[i + 1]
            if o + n == o2:
                self._free[i : i + 2] = [(o, n + n2)]
        if i > 0:
            o0, n0 = self._free[i - 1]
            o, n = self._free[i]
            if o0 + n0 == o:
                self._free[i - 1 : i + 1] = [(o0, n0 + n)]

    def clear(self) -> None:
        """Drop every allocation (device buffers stay; rows are dead)."""
        self._offsets.clear()
        self._free = []
        self._tail = 1
        self.generation += 1

    def _alloc(self, n: int) -> Optional[int]:
        for i, (off, fn) in enumerate(self._free):
            if fn >= n:
                if fn == n:
                    del self._free[i]
                else:
                    self._free[i] = (off + n, fn - n)
                return off
        if self.cap and self._tail + n <= self.cap:
            off = self._tail
            self._tail += n
            return off
        return None

    # --------------------------------------------------------- device --

    def _put(self, a):
        if self.device is not None:
            return jax.device_put(a, self.device)
        return jnp.asarray(a)

    def _init_device(self, cap: int) -> None:
        self.cap = cap
        self.geom = self._put(jnp.zeros((cap, 4, CH), jnp.int32))
        self.trav = self._put(jnp.zeros((cap, 1, CH), jnp.float32))
        self.sprof = self._put(jnp.zeros((cap, 1, CH), jnp.int32))
        self.aux = self._put(jnp.zeros((cap, 4, CH), jnp.float32))
        self.items = self._put(jnp.full((cap, 1, IT_ARENA), -1, jnp.int32))

    def _grow(self, need_rows: int) -> None:
        new_cap = max(self.cap * 2 if self.cap else self.min_cap, self.min_cap)
        while new_cap < self._tail + need_rows:
            new_cap *= 2
        if new_cap > self.MAX_CAP:
            raise MemoryError(
                f"chunk arena would exceed MAX_CAP ({new_cap} rows)"
            )
        if self.cap == 0:
            self._init_device(new_cap)
            return
        grow = _grow_jit(self.cap, new_cap, self._donate)
        self.geom, self.trav, self.sprof, self.aux, self.items = grow(
            self.geom, self.trav, self.sprof, self.aux, self.items
        )
        self.cap = new_cap

    def insert(self, pairs) -> None:
        """Insert [(key, TileChunks)] — ONE h2d upload for all of them,
        then a jitted scatter into the (donated) arenas."""
        seen = set()
        deduped = []
        for k, c in pairs:
            if k in self._offsets or k in seen:
                continue
            seen.add(k)
            deduped.append((k, c))
        pairs = deduped
        if not pairs:
            return
        rows = sum(int(c.kind.shape[0]) for _, c in pairs)
        offs = []
        for k, c in pairs:
            n = int(c.kind.shape[0])
            off = self._alloc(n)
            if off is None:
                # _grow sizes the new cap to fit _tail + rows, so the
                # tail allocation below always succeeds.
                self._grow(rows)
                off = self._alloc(n)
                assert off is not None
            offs.append(off)
            self._offsets[k] = (off, n)

        it_new = max(int(c.items.shape[2]) for _, c in pairs)
        it_new = _next_pow2(it_new, 256)
        n_bucket = _next_pow2(rows, 8)
        parts = []
        dst = np.zeros(n_bucket, np.int32)
        pos = 0
        for (k, c), off in zip(pairs, offs):
            n = int(c.kind.shape[0])
            dst[pos : pos + n] = np.arange(off, off + n, dtype=np.int32)
            pos += n
        geom = np.zeros((n_bucket, 4, CH), np.int32)
        trav = np.zeros((n_bucket, 1, CH), np.float32)
        sprof = np.zeros((n_bucket, 1, CH), np.int32)
        aux = np.zeros((n_bucket, 4, CH), np.float32)
        items = np.full((n_bucket, 1, it_new), -1, np.int32)
        pos = 0
        for (k, c) in pairs:
            n = int(c.kind.shape[0])
            geom[pos : pos + n] = c.geom
            trav[pos : pos + n] = c.trav
            sprof[pos : pos + n] = c.sprof
            aux[pos : pos + n] = c.aux
            items[pos : pos + n, :, : c.items.shape[2]] = c.items
            pos += n
        # geom / sprof / items ride as i16 pairs: |geom| is bounded by
        # FAST_COORD_BOUND (12000) at assembly, sprof holds small
        # profile-table indices, and an item word is sg | (blk << 8)
        # [| sub << 14 for steep16] <= 24447 < 0x8000 (pad -1
        # round-trips as i16 -1).  Halves the cold upload for those
        # fields; the device insert jit sign-extends.
        assert int(np.abs(sprof).max(initial=0)) < 32768
        parts = [
            geom.astype(np.int16).reshape(-1).view(np.int32),
            trav.reshape(-1).view(np.int32),
            sprof.astype(np.int16).reshape(-1).view(np.int32),
            aux.reshape(-1).view(np.int32),
            items.astype(np.int16).reshape(-1).view(np.int32),
            dst,
        ]
        payload = np.concatenate(parts)
        ins = _insert_jit(n_bucket, it_new, self.cap, self._donate)
        self.geom, self.trav, self.sprof, self.aux, self.items = ins(
            self._put(payload),
            self.geom, self.trav, self.sprof, self.aux, self.items,
        )


@functools.lru_cache(maxsize=32)
def _grow_jit(old_cap: int, new_cap: int, donate: bool):
    def grow(geom, trav, sprof, aux, items):
        def up(old, fill, dtype, shape):
            new = jnp.full((new_cap,) + shape, fill, dtype)
            return new.at[:old_cap].set(old)

        return (
            up(geom, 0, jnp.int32, (4, CH)),
            up(trav, 0.0, jnp.float32, (1, CH)),
            up(sprof, 0, jnp.int32, (1, CH)),
            up(aux, 0.0, jnp.float32, (4, CH)),
            up(items, -1, jnp.int32, (1, IT_ARENA)),
        )

    return jax.jit(grow, donate_argnums=tuple(range(5)) if donate else ())


@functools.lru_cache(maxsize=64)
def _insert_jit(n: int, it_new: int, cap: int, donate: bool):
    # i32 word counts per part (geom/sprof/items travel as i16 pairs).
    sizes = [n * 2 * CH, n * CH, n * CH // 2, n * 4 * CH, n * it_new // 2, n]

    def unpack_i16(seg, shape):
        h = jax.lax.bitcast_convert_type(seg, jnp.int16)  # (k, 2) LE
        return h.reshape(-1).astype(jnp.int32).reshape(shape)

    def ins(payload, geom, trav, sprof, aux, items):
        o = 0
        segs = []
        for s in sizes:
            segs.append(jax.lax.dynamic_slice(payload, (o,), (s,)))
            o += s
        g = unpack_i16(segs[0], (n, 4, CH))
        t = jax.lax.bitcast_convert_type(segs[1], jnp.float32).reshape(n, 1, CH)
        sp = unpack_i16(segs[2], (n, 1, CH))
        ax = jax.lax.bitcast_convert_type(segs[3], jnp.float32).reshape(n, 4, CH)
        it = unpack_i16(segs[4], (n, 1, it_new))
        if it_new < IT_ARENA:
            it = jnp.pad(
                it, ((0, 0), (0, 0), (0, IT_ARENA - it_new)), constant_values=-1
            )
        dst = segs[5]
        return (
            geom.at[dst].set(g),
            trav.at[dst].set(t),
            sprof.at[dst].set(sp),
            aux.at[dst].set(ax),
            items.at[dst].set(it),
        )

    return jax.jit(ins, donate_argnums=tuple(range(1, 6)) if donate else ())
