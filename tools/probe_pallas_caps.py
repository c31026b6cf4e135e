#!/usr/bin/env python
"""Probe Mosaic capabilities needed by the RLE emit kernel:
(a) take_along_axis (dynamic gather) along lanes in VMEM;
(b) DMA from VMEM scratch to a dynamic offset of an ANY-space output."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm_renderer_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_take_along():
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[...]
        idx = idx_ref[...]
        o_ref[...] = jnp.take_along_axis(x, idx, axis=1)

    x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 256, (8, 256)).astype(np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
    )(x, idx)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    ok = np.array_equal(np.asarray(out), want)
    print("take_along lanes:", "OK" if ok else "WRONG", flush=True)


def probe_dyn_dma():
    # Copy each (1,256) row of the input to a dynamic offset (from
    # scalar prefetch) of a flat ANY-space output.
    def kernel(offs_s, x_ref, o_ref, scratch, sem):
        i = pl.program_id(0)
        scratch[...] = x_ref[...] + 100
        cp = pltpu.make_async_copy(
            scratch, o_ref.at[pl.ds(offs_s[i], 256)], sem
        )
        cp.start()
        cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 256), lambda i, *_: (i, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, 256), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    x = jnp.arange(4 * 256, dtype=jnp.int32).reshape(4, 256)
    offs = jnp.asarray([0, 300, 700, 640], jnp.int32)  # overlapping on purpose
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1024,), jnp.int32),
    )(offs, x)
    o = np.asarray(out)
    want0 = np.arange(256) + 100
    ok0 = np.array_equal(o[0:256], want0)
    # row1 at 300..556, row3 at 640..896 overwrites row2's 700..956 tail
    ok1 = np.array_equal(o[300:556], np.arange(256, 512) + 100)
    ok3 = np.array_equal(o[640:896], np.arange(768, 1024) + 100)
    print("dyn-offset DMA:", "OK" if (ok0 and ok1 and ok3) else f"WRONG {ok0} {ok1} {ok3}", flush=True)


probe_take_along()
probe_dyn_dma()
