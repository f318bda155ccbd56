"""Pallas TPU kernel: segment-sum of sorted rows (a gather/matmul scatter).

``out[r] = sum over j with sidx[j] == r of vals[j]`` for SORTED ``sidx`` —
the transpose of a row gather, i.e. exactly what ``grad.at[idx].add(rows)``
computes, without an XLA scatter. XLA lowers scatter-add to a serial
per-index loop on TPU (~8.5 ms/step for the three plane-grad scatters in
the bench config, round-3 trace); this kernel instead rides the MXU:

- grid over OUTPUT row blocks of R=128; block b owns rows [bR, bR+R).
  Because the slots are sorted, block b's updates form one contiguous slot
  range [bounds[b], bounds[b+1]) — located OUTSIDE the kernel by one
  ~200-query searchsorted (cheap; it is the 25k-query per-row variant that
  costs milliseconds, see grid_sample._segment_rows_sum's negative result).
- per block, double-buffered DMA streams K-slot chunks of a [M, 128]
  packed (values | bitcast row id) matrix from HBM (full-lane rows — the
  only reliably fast DMA slice shape, CLAUDE.md probe notes).
- each chunk contributes ``mask.T @ vals`` where ``mask[j, r] =
  (row[j] == bR + r)`` — a [K, R] x [K, D] sublane-contracted
  ``dot_general``, the same MXU form the blend kernel uses for its color
  accumulation (blend_pallas._fwd_kernel). Sortedness makes the mask
  self-limiting: slots DMA'd from outside the block's range have rel-row
  outside [0, R) and match nothing, so no position bookkeeping is needed.

Padding rows carry row id -1 and match nothing. Row ids ride as FLOAT
VALUES in a float lane (exact for |id| < 2^24; guarded). Bitcasting int32
ids into the float lane instead is a measured TRAP on hardware: ids below
~2^23 bitcast to f32 DENORMALS, and the TPU vector path flushes denormals
to zero, so every small id silently became row 0 (interpret mode hides
this — both `lax.bitcast_convert_type` and `pltpu.bitcast` variants
failed only on the chip). The mask matmul must also pass
``precision=HIGHEST``: the MXU's default single-pass bf16 rounds the
update values to ~3 digits (measured 2e-2 abs error vs 3e-7 at HIGHEST).

Summation order within a row differs from the XLA scatter (per-chunk MXU
sums, then f32 adds across chunks), so results match to float tolerance,
not bitwise.

Measured NEGATIVE in the train step (SPLATFIELDS_PLANE_GRAD_PALLAS=on,
round 3): the kernel beats the scatter IN PLACE (traced 4.95 vs 8.47 ms
for the 3-plane pool, exact to 5e-8 at 100k points) but the step is 51.8
vs 47.2 ms — the per-plane sort + reorder gather + packed-concat prep and
a collateral slowdown of the blend's pack-assembly gather (1.4 -> 7.1 ms
traced) outweigh it; the QUAD_MULTI-batched variant is 54.1 ms. Kept as a
tested op: it is the right primitive where the input is ALREADY sorted or
the consumer is not embedded in a scatter-friendly XLA program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 128   # default output rows per grid step (one lane tile of the mask
           # matmul); pass r_block > 128 (a multiple of 128) to amortize
           # the per-grid-step overhead over several lane tiles when the
           # output is huge and sparsely hit (the NGP table: 2^20 rows
           # per level, ~0.8 updates/row -> 8192 128-row blocks at ~1.5us
           # of sequencing each dominates the actual math)


def _seg_kernel(bounds_ref, packed_hbm, out_ref, chunk_vmem, sem, *,
                k: int, d: int, r_block: int):
    b = pl.program_id(0)
    start = bounds_ref[b]
    end = bounds_ref[b + 1]
    base_row = b * r_block
    # sublane-align the DMA offset; the extra leading slots belong to the
    # previous block (rel-row < 0) and self-mask out
    start8 = (start // 8) * 8
    n_chunks = (end - start8 + k - 1) // k

    def _copy(c, slot):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(start8 + c * k, k), :],
            chunk_vmem.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        _copy(0, 0).start()

    def body(c, acc):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _copy(c + 1, 1 - slot).start()

        _copy(c, slot).wait()
        chunk = chunk_vmem[slot]
        rows = chunk[:, d:d + 1]                             # [K, 1] float id
        col = jax.lax.broadcasted_iota(
            jnp.int32, (k, r_block), 1).astype(jnp.float32)
        m = (rows - jnp.float32(base_row) == col).astype(
            jnp.float32)                                     # [K, R]
        part = jax.lax.dot_general(
            m, chunk[:, :d], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [R, D]
        return acc + part

    out_ref[:] = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((r_block, d), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_rows", "k", "interpret",
                                              "r_block"))
def sorted_segment_sum(sidx: jnp.ndarray, vals: jnp.ndarray, n_rows: int,
                       k: int = 512, interpret: bool | None = None,
                       r_block: int = _R) -> jnp.ndarray:
    """Sum ``vals`` rows into ``n_rows`` segments given SORTED ``sidx``.

    Args:
        sidx: [N] int32, ascending. Out-of-range ids (< 0 or >= n_rows)
            are dropped (they land in no block / match no rel-row).
        vals: [N, D] float32 update rows.
        n_rows: number of output segments.
        k: DMA chunk size (slots per MXU mask matmul).
    Returns [n_rows, D] float32 segment sums.
    """
    n, d = vals.shape
    if r_block <= 0 or r_block % 128:
        raise ValueError(
            f"sorted_segment_sum: r_block={r_block} must be a positive "
            "multiple of 128 (lane tiles)")
    if k <= 0 or k % 8:
        # The kernel's dynamic DMA slices and the k+8 overrun pad assume a
        # positive sublane-aligned chunk; a stray k would silently misalign.
        raise ValueError(
            f"sorted_segment_sum: k={k} must be a positive multiple of 8")
    if n_rows > 1 << 24:
        # ids <= n_rows - 1 <= 2^24 - 1 ride a float lane exactly (every
        # int up to 2^24 is f32-exact); the NGP flat table is exactly
        # 16 * 2^20 = 2^24 rows.
        raise ValueError(
            f"sorted_segment_sum: n_rows={n_rows} exceeds the float-coded "
            "row-id range (2^24); use the XLA scatter for tables this big")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows_pad = -(-n_rows // r_block) * r_block
    lp = -(-(d + 1) // 128) * 128
    lane_id = sidx.astype(jnp.float32)[:, None]
    packed = jnp.concatenate(
        [vals.astype(jnp.float32), lane_id,
         jnp.zeros((n, lp - d - 1), jnp.float32)], axis=1)
    # DMA-overrun pad: last chunk of a block may read up to k + 7 slots
    # past the block's end; padding rows match no block (row id -1)
    pad = jnp.zeros((k + 8, lp), jnp.float32).at[:, d].set(-1.0)
    packed = jnp.concatenate([packed, pad], axis=0)

    n_blocks = rows_pad // r_block
    bounds = jnp.searchsorted(
        sidx, jnp.arange(n_blocks + 1, dtype=jnp.int32) * r_block,
        side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((r_block, d), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, k, lp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_seg_kernel, k=k, d=d, r_block=r_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), jnp.float32),
        interpret=interpret,
    )(bounds, packed)
    return out[:n_rows]
