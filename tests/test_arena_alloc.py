"""Host-side slab-allocator invariants of the device chunk arena
(parallel/arena.py) — no device work, fast tier.

Invariants after any alloc/free sequence:
* allocations are disjoint, inside [1, tail), and row 0 stays reserved;
* the free list is sorted, coalesced (no adjacent ranges), and disjoint
  from every allocation;
* allocated + free rows account exactly for [1, tail).
"""

import numpy as np
import pytest

from osm_renderer_tpu.parallel.arena import ChunkArena


def _check_invariants(a: ChunkArena):
    spans = sorted(a._offsets.values())
    for off, n in spans:
        assert off >= 1 and n >= 1 and off + n <= a._tail
    for (o1, n1), (o2, n2) in zip(spans, spans[1:]):
        assert o1 + n1 <= o2, "overlapping allocations"
    free = a._free
    assert free == sorted(free)
    for (o1, n1), (o2, n2) in zip(free, free[1:]):
        assert o1 + n1 < o2, "uncoalesced or overlapping free ranges"
    used = sum(n for _, n in spans)
    freed = sum(n for _, n in free)
    assert used + freed == a._tail - 1
    # free ranges disjoint from allocations
    occ = np.zeros(a._tail, dtype=bool)
    for off, n in spans:
        assert not occ[off : off + n].any()
        occ[off : off + n] = True
    for off, n in free:
        assert not occ[off : off + n].any()
        occ[off : off + n] = True


def test_alloc_free_coalesce_fuzz():
    a = ChunkArena()
    a.cap = 1 << 20  # pure-host: pretend the device arrays exist
    rng = np.random.default_rng(7)
    live = {}
    for step in range(3000):
        if live and rng.random() < 0.45:
            k = list(live)[int(rng.integers(len(live)))]
            a.free(k)
            del live[k]
        else:
            k = f"t{step}"
            n = int(rng.integers(1, 64))
            off = a._alloc(n)
            assert off is not None
            a._offsets[k] = (off, n)
            live[k] = n
        if step % 97 == 0:
            _check_invariants(a)
    _check_invariants(a)
    # Free everything: the arena coalesces back to one range + tail.
    for k in list(live):
        a.free(k)
    _check_invariants(a)
    assert sum(n for _, n in a._free) == a._tail - 1
    assert len(a._free) <= 1


def test_first_fit_reuses_freed_rows():
    a = ChunkArena()
    a.cap = 4096
    o1 = a._alloc(10); a._offsets["a"] = (o1, 10)
    o2 = a._alloc(20); a._offsets["b"] = (o2, 20)
    o3 = a._alloc(10); a._offsets["c"] = (o3, 10)
    tail = a._tail
    a.free("b")
    # An allocation that fits the hole reuses it; tail does not grow.
    o4 = a._alloc(20)
    assert o4 == o2 and a._tail == tail
    a._offsets["d"] = (o4, 20)
    _check_invariants(a)


def test_clear_resets_generation_and_space():
    a = ChunkArena()
    a.cap = 128
    a._offsets["x"] = (a._alloc(5), 5)
    g = a.generation
    a.clear()
    assert a.generation == g + 1
    assert a._tail == 1 and not a._offsets and not a._free
    assert "x" not in a


def test_free_unknown_key_is_noop():
    a = ChunkArena()
    a.cap = 128
    a.free("nope")
    assert a._tail == 1 and not a._free
