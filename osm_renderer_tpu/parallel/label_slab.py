"""Device-resident committed-label-layer slab for warm serving.

The reference composites labels into the tile buffer inline with the
draw loop (`drawer.rs:107-125`, `labeler.rs:16-37`) — on a CPU that is
a minor cost.  Here the host's label *placement* (collision, glyph
atlas — semantics identical to the reference) runs once per tile, and
the committed layer is then kept ON DEVICE so warm labeled serving
composites with device arithmetic fused into the render jit instead of
host numpy/C++ on the single contended core.

Storage: one (cap, 2, ts) i32 plane per tile size.  A label layer's
non-zero-alpha bbox rows occupy consecutive slab rows at full tile
width; per pixel

  plane0 = c_r | c_g << 8 | c_b << 16   (premultiplied color, u8)
  plane1 = A - 1, A = clamp(round((1 - alpha) * 65536), 1, 65536)

Row 0 is the reserved identity row (plane0 = 0, plane1 = 65535): the
blend `(c << 16 | wait)` — see `blit_planar` — passes the base pixel
through exactly, so unlabeled rows simply map to row 0.

Quantization: pixels with alpha == 1 store c = trunc(rgb255 + 1e-9)
(the host composite's exact value — opaque label cores are
byte-identical); partial-alpha pixels store c = round(rgb255), making
the device blend's total error <= 0.51 of a color step, i.e. at most
1/255 off the host composite (PARITY.md label-deviation budget).

Allocation mirrors parallel/arena.py: first-fit free list with
coalescing, batched inserts as ONE h2d upload + a donated jitted
scatter, LRU eviction under row-capacity pressure (current batch keys
pinned).  Not thread-safe; callers serialize (BatchRenderer holds its
cache lock).
"""

from __future__ import annotations

import functools
from bisect import insort
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

IDENTITY_A16P = 65535  # plane1 value whose blend is an exact passthrough


def quantize_compact(compact, ts: int) -> Tuple[np.ndarray, int]:
    """(y0, y1, x0, x1, rgb255 f64, alpha f64) from
    labeler._compact_label_layer -> ((n_rows, 2, ts) i32 slab rows, y0).
    Full tile width; pixels outside [x0, x1) are identity."""
    y0, y1, x0, x1, rgb255, alpha = compact
    n = y1 - y0
    rows = np.empty((n, 2, ts), np.int32)
    rows[:, 0, :] = 0
    rows[:, 1, :] = IDENTITY_A16P
    a = alpha[..., 0]
    opaque = a >= 1.0
    c = np.where(
        opaque[..., None],
        np.trunc(rgb255 + 1e-9),
        np.floor(rgb255 + 0.5),
    )
    c = np.clip(c, 0.0, 255.0).astype(np.int32)
    A = np.floor((1.0 - a) * 65536.0 + 0.5)
    A = np.clip(A, 1.0, 65536.0).astype(np.int32)
    rows[:, 0, x0:x1] = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)
    rows[:, 1, x0:x1] = A - 1
    return rows, y0


def blit_planar(planar, plane, lrow):
    """Blend device-resident label rows over a planar u8 render.

    planar: (T, 4, ts, ts) u8 (channel 3 ignored/passthrough)
    plane:  (cap, 2, ts) i32 label slab
    lrow:   (T, ts) i32 slab row per output row (0 = identity)

    Pure XLA (runs under jit on any backend); the gather is T*ts row
    indices pulling (2, ts) rows — the same shape of gather the chunk
    arena's batch assembly already rides.
    """
    patch = plane[lrow]                      # (T, y, 2, x) i32
    p0 = patch[:, :, 0, :]                   # (T, y, x)
    A = patch[:, :, 1, :] + 1                # [1, 65536]
    c = jnp.stack(
        [p0 & 255, (p0 >> 8) & 255, (p0 >> 16) & 255], axis=1
    )                                        # (T, 3, y, x)
    base = planar[:, :3].astype(jnp.int32)
    blended = (c * 65536 + A[:, None] * base) >> 16
    out3 = jnp.minimum(blended, 255).astype(jnp.uint8)
    return jnp.concatenate([out3, planar[:, 3:]], axis=1)


class LabelSlab:
    """Slab-allocated device rows of quantized committed label layers."""

    MAX_CAP = 65536  # rows; 2 KB/row at ts=256 -> 128 MB HBM ceiling

    def __init__(self, ts: int, min_cap: int = 1024, device=None,
                 max_tiles: int = 4096):
        self.ts = ts
        self.device = device
        self.min_cap = min_cap
        self.max_tiles = max_tiles
        self.cap = 0
        self.plane = None  # (cap, 2, ts) i32
        # key -> (row offset, n_rows, y0); LRU order = insertion/touch.
        self._offsets: "OrderedDict[object, Tuple[int, int, int]]" = OrderedDict()
        self._free: List[Tuple[int, int]] = []
        self._tail = 1  # row 0 reserved as the identity row
        self.generation = 0
        self._donate = jax.default_backend() == "tpu"

    # ---------------------------------------------------------- alloc --

    def __contains__(self, key) -> bool:
        return key in self._offsets

    def offset(self, key) -> Tuple[int, int, int]:
        self._offsets.move_to_end(key)
        return self._offsets[key]

    def free(self, key) -> None:
        got = self._offsets.pop(key, None)
        if got is None:
            return
        off, n, _ = got
        insort(self._free, (off, n))
        self._coalesce_at(off)

    def _coalesce_at(self, off: int) -> None:
        i = next((j for j, (o, _) in enumerate(self._free) if o == off), None)
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

    def _alloc_evicting(self, n: int, pinned) -> int:
        """Allocate n rows, LRU-evicting unpinned tiles under pressure.
        Raises MemoryError when eviction can't free enough (callers
        clear + retry, like the chunk arena's overflow path)."""
        while True:
            off = self._alloc(n)
            if off is not None:
                return off
            if self.cap < self.MAX_CAP:
                self._grow(n)
                continue
            victim = next(
                (k for k in self._offsets if k not in pinned), None
            )
            if victim is None:
                raise MemoryError("label slab exhausted by pinned batch")
            self.free(victim)

    # --------------------------------------------------------- device --

    def _put(self, a):
        if self.device is not None:
            return jax.device_put(a, self.device)
        return jnp.asarray(a)

    def _grow(self, need_rows: int) -> None:
        new_cap = max(self.cap * 2 if self.cap else self.min_cap, self.min_cap)
        while new_cap < self._tail + need_rows:
            new_cap *= 2
        new_cap = min(new_cap, self.MAX_CAP)
        if new_cap < self._tail + need_rows:
            raise MemoryError(
                f"label slab would exceed MAX_CAP ({self._tail + need_rows} rows)"
            )
        if self.cap == 0:
            self.cap = new_cap
            init = np.zeros((new_cap, 2, self.ts), np.int32)
            init[:, 1, :] = IDENTITY_A16P
            self.plane = self._put(init)
            return
        self.plane = _grow_jit(self.cap, new_cap, self.ts, self._donate)(
            self.plane
        )
        self.cap = new_cap

    def insert(self, pairs) -> None:
        """Insert [(key, compact)] — ONE h2d upload for all of them.
        Keys already resident are touched (LRU), not re-uploaded."""
        pinned = set(k for k, _ in pairs)
        deduped = []
        seen = set()
        for k, c in pairs:
            if k in self._offsets:
                self._offsets.move_to_end(k)
                continue
            if k in seen:
                continue
            seen.add(k)
            deduped.append((k, c))
        if not deduped:
            return
        quantized = [
            (k, quantize_compact(c, self.ts)) for k, c in deduped
        ]
        rows_total = sum(q.shape[0] for _, (q, _) in quantized)
        offs = []
        for k, (q, y0) in quantized:
            n = q.shape[0]
            off = self._alloc_evicting(n, pinned)
            offs.append(off)
            self._offsets[k] = (off, n, y0)
        while len(self._offsets) > self.max_tiles:
            victim = next(
                (k for k in self._offsets if k not in pinned), None
            )
            if victim is None:
                break
            self.free(victim)

        n_bucket = max(8, 1 << (rows_total - 1).bit_length())
        data = np.zeros((n_bucket, 2, self.ts), np.int32)
        data[:, 1, :] = IDENTITY_A16P
        dst = np.zeros(n_bucket, np.int32)
        pos = 0
        for (k, (q, _)), off in zip(quantized, offs):
            n = q.shape[0]
            data[pos : pos + n] = q
            dst[pos : pos + n] = np.arange(off, off + n, dtype=np.int32)
            pos += n
        payload = np.concatenate([data.reshape(-1), dst])
        ins = _insert_jit(n_bucket, self.cap, self.ts, self._donate)
        self.plane = ins(self._put(payload), self.plane)

    def lrow(self, n_tiles: int, keyed: List[Tuple[int, object]]) -> np.ndarray:
        """(T, ts) i32 slab-row map for a batch: [(tile_index, key)]
        entries point their layer's bbox rows at the slab; everything
        else maps to the identity row 0."""
        lr = np.zeros((n_tiles, self.ts), np.int32)
        for ti, key in keyed:
            off, n, y0 = self._offsets[key]
            self._offsets.move_to_end(key)
            lr[ti, y0 : y0 + n] = np.arange(off, off + n, dtype=np.int32)
        return lr

    def ltriples(self, n_tiles: int, keyed: List[Tuple[int, object]]) -> np.ndarray:
        """(T, 3) i32 compact slab-row map [(off, y0, n) per tile;
        n = 0 -> unlabeled].  A layer's rows are always consecutive in
        the slab, so the full (T, ts) lrow map expands on device
        (expand_ltriples) and the per-batch upload carries 12 bytes per
        tile instead of 4*ts — the warm labeled packed upload rides the
        same latency-bound tunnel transfer as the unlabeled one."""
        tri = np.zeros((n_tiles, 3), np.int32)
        for ti, key in keyed:
            off, n, y0 = self._offsets[key]
            self._offsets.move_to_end(key)
            tri[ti] = (off, y0, n)
        return tri


def expand_ltriples(tri, ts: int):
    """(T, 3) i32 (off, y0, n) -> (T, ts) i32 lrow map (jit-traceable;
    row 0 = identity for rows outside [y0, y0 + n))."""
    off = tri[:, 0:1]
    y0 = tri[:, 1:2]
    n = tri[:, 2:3]
    ys = jnp.arange(ts, dtype=jnp.int32)[None, :]
    return jnp.where((ys >= y0) & (ys < y0 + n), off + (ys - y0), 0)


@functools.lru_cache(maxsize=32)
def _grow_jit(old_cap: int, new_cap: int, ts: int, donate: bool):
    def grow(plane):
        new = jnp.zeros((new_cap, 2, ts), jnp.int32)
        new = new.at[:, 1, :].set(IDENTITY_A16P)
        return new.at[:old_cap].set(plane)

    return jax.jit(grow, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=64)
def _insert_jit(n: int, cap: int, ts: int, donate: bool):
    def ins(payload, plane):
        data = payload[: n * 2 * ts].reshape(n, 2, ts)
        dst = payload[n * 2 * ts :]
        return plane.at[dst].set(data)

    return jax.jit(ins, donate_argnums=(1,) if donate else ())
