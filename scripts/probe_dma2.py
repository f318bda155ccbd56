"""Isolate which Mosaic construct fails: lane-offset DMA, in-kernel
transpose, or the [K,16] write. One case per run; full error printed.

Usage: python scripts/probe_dma2.py <case>
cases: transpose, lane_dma_aligned, lane_dma_unaligned, write16, chunk3d
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128
A = 16


def case_transpose():
    """[16,128] -> [128,16] transpose on VMEM data, no fancy DMA."""
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...])

    x = jnp.asarray(np.random.rand(A, K).astype(np.float32))
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((K, A), jnp.float32))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).T)
    print("transpose OK")


def case_lane_dma(aligned: bool):
    """DMA [16, K] slice from [16, D] HBM at dynamic lane offset."""
    def kern(starts_ref, src_hbm, o_ref, chunk, sem):
        cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(starts_ref[0], K)], chunk, sem)
        cp.start()
        cp.wait()
        o_ref[...] = chunk[...]

    d = 1 << 14
    src_t = jnp.asarray(np.random.rand(A, d).astype(np.float32))
    start = np.int32(256 if aligned else 37)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((A, K), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, K), jnp.float32),
    )(jnp.asarray([start]), src_t)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(src_t)[:, start:start + K])
    print(f"lane_dma aligned={aligned} OK")


def case_write16():
    """DMA-write a [K, 16] VMEM buffer into [D, 16] HBM rows."""
    def kern(starts_ref, src, o_hbm, wbuf, sem):
        wbuf[...] = src[...] * 2.0
        cp = pltpu.make_async_copy(
            wbuf, o_hbm.at[pl.ds(starts_ref[0], K), :], sem)
        cp.start()
        cp.wait()

    d = 1 << 14
    src = jnp.asarray(np.random.rand(K, A).astype(np.float32))
    start = np.int32(100)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((K, A), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, A), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([start]), src)
    got = np.asarray(out)[start:start + K]
    np.testing.assert_allclose(got, np.asarray(src) * 2.0)
    print("write16 OK")


def case_chunk3d():
    """DMA [1, 16, K] block from a [C, 16, K] HBM array (aligned plan)."""
    def kern(starts_ref, src_hbm, o_ref, chunk, sem):
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(starts_ref[0], 1)], chunk, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.transpose(chunk[0])    # [K, 16]

    c = 64
    src = jnp.asarray(np.random.rand(c, A, K).astype(np.float32))
    start = np.int32(5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, A, K), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, A), jnp.float32),
    )(jnp.asarray([start]), src)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src)[start].T)
    print("chunk3d OK")


CASES = {
    "transpose": case_transpose,
    "lane_dma_aligned": lambda: case_lane_dma(True),
    "lane_dma_unaligned": lambda: case_lane_dma(False),
    "write16": case_write16,
    "chunk3d": case_chunk3d,
}

if __name__ == "__main__":
    CASES[sys.argv[1]]()
