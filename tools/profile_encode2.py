#!/usr/bin/env python
"""Bisect the slow op in the RLE encode graph (each timed via full fetch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

nb, B, RT = 7680, 256, 393216
TN = nb * B
rng = np.random.default_rng(0)
vb = jnp.asarray(rng.integers(0, 50, size=(nb, B)).astype(np.int32))
offsets_np = np.sort(rng.choice(TN // 2, size=nb, replace=False)).astype(np.int32)
offsets = jnp.asarray(offsets_np)
v_flat = jnp.asarray(rng.integers(0, 1 << 22, size=(TN,)).astype(np.int32))
idx_big = jnp.asarray(rng.integers(0, TN, size=(RT,)).astype(np.int32))
idx_b = jnp.asarray(rng.integers(0, nb, size=(RT,)).astype(np.int32))
idx_w = jnp.asarray(rng.integers(0, B, size=(RT,)).astype(np.int32))
jax.block_until_ready([vb, offsets, v_flat, idx_big, idx_b, idx_w])


def t(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.device_get(r))  # force real exec + fetch
    t0 = time.perf_counter()
    r = f(*args)
    s = np.asarray(jax.device_get(r))
    print(f"{tag:28s} {(time.perf_counter()-t0)*1e3:9.1f} ms (fetch {s.nbytes/1e6:.2f} MB)", flush=True)


#t("sort (nb,B)", lambda x: jax.lax.sort(x, dimension=1)[:, :2], vb)
t("cumsum (nb,)", lambda x: jnp.cumsum(x.sum(axis=1))[-1:], vb)
t("searchsorted 393k into 7.7k", lambda o: jnp.searchsorted(o, jnp.arange(RT, dtype=jnp.int32), side="right")[:4], offsets)
t("gather 393k from 2M", lambda v, i: v[i][:4], v_flat, idx_big)
t("gather2d 393k from (nb,B)", lambda m, b, w: m[b, w][:4], vb, idx_b, idx_w)
t("take_along 393k of 2M", lambda v, i: jnp.take(v, i)[:4], v_flat, idx_big)
