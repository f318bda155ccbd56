"""Pallas TPU kernel for the front-to-back tile blend (forward + backward).

Same math as ``blend_jax`` (see that module for the CUDA-parity semantics
and the closed-form early-termination derivation), but with the two things
the dense XLA formulation cannot express:

- **per-tile trip counts**: each grid step (one 16x16 tile) loops only over
  ``ceil(count[t] / K)`` chunks of the depth-sorted instance array instead
  of the full tile_cap — on real scenes the mean per-tile count is ~5-10x
  below the cap, which is a direct wall-clock saving;
- **early termination**: the chunk loop stops as soon as every pixel's
  transmittance has fallen below 1e-4 (front-to-back saturation), like the
  CUDA kernel's per-pixel done flags.

Data flow per tile: the packed [D, A] instance-sorted attribute matrix
stays in HBM; each chunk of K rows is DMA'd into VMEM, transposed to
[A, K] registers, and blended against the tile's [P] pixels with one
cumprod per chunk. The backward kernel replays chunks front-to-back using
suffix accumulators (equivalent to the CUDA back-to-front replay) and
writes per-instance gradients [D, A] — disjoint across tiles since every
duplicated instance belongs to exactly one tile, so no atomics are needed
(SURVEY hard-part 1).

The public entry :func:`blend_sorted_pallas` is a ``jax.custom_vjp`` drop-in
for ``blend_jax.blend_tiles`` (same packed-attribute contract).

Numerics: on a 100k-splat 800x800 scene the kernel's color output is within
1.9e-3 of the XLA blend on TPU — and the XLA blend itself differs from its
own CPU execution by 3.7e-3 (TPU exp approximation + excess-precision
fusion on near-saturated cumulative products). Interpret-mode parity vs the
XLA blend is 1e-5 (tests/test_blend_pallas.py), i.e. the gap is platform
float behavior, not kernel math.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
_A = 10   # packed layout: mx, my, ca, cb, cc, op, r, g, b, z
_AP = 128  # minor-dim padding: HBM DMA slices must be 128-lane aligned (and
           # XLA pads the [D, 10] layout to [D, 128] in HBM regardless)


class PallasBlendOut(NamedTuple):
    color: jnp.ndarray    # [T, 3, P]
    depth: jnp.ndarray    # [T, P]
    final_t: jnp.ndarray  # [T, P]


def _pixel_coords(tile_id, tiles_x: int, tile_size: int, p: int):
    tx0 = (tile_id % tiles_x) * tile_size
    ty0 = (tile_id // tiles_x) * tile_size
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx0 + lin % tile_size).astype(jnp.float32)
    py = (ty0 + lin // tile_size).astype(jnp.float32)
    return px, py  # [1, P] each


def _cumprod_rows(x, k: int, p: int):
    """Inclusive cumprod along axis 0 of [K, P] — Hillis-Steele log-step
    scan (Mosaic has no cumprod primitive)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, p), 0)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, 0)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _cumsum_rows(x, k: int, p: int):
    """Inclusive cumsum along axis 0 of [K, P] (log-step scan)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, p), 0)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, 0)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _chunk_alpha(attrs, px, py, t_carry_full, k: int, p: int):
    """attrs [K, A] chunk -> (alpha [K,P], s [K,P], t_excl [K,P], rgbz)."""
    mx = attrs[:, 0:1]
    my = attrs[:, 1:2]
    ca = attrs[:, 2:3]
    cb = attrs[:, 3:4]
    cc = attrs[:, 4:5]
    op = attrs[:, 5:6]
    dx = mx - px            # [K, P] via broadcast [K,1]x[1,P]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(0.99, op * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < _ALPHA_MIN), 0.0, alpha)
    s = t_carry_full * _cumprod_rows(1.0 - alpha, k, p)   # [K, P]
    t_excl = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k, p), 0) == 0,
        t_carry_full,
        pltpu.roll(s, 1, 0),
    )
    return alpha, s, t_excl


def _fwd_kernel(tile_start_ref, counts_ref, tile_ids_ref, pack_hbm,
                color_ref, depth_ref,
                tfinal_ref, chunk_vmem, sem, *, tiles_x: int, tile_size: int,
                k: int, tile_cap: int, tpb: int):
    p = tile_size * tile_size
    d_total = pack_hbm.shape[0]

    # tpb tiles share one grid step: measured 4.2 ms of the 6.1 ms forward
    # was pure per-grid-step overhead at one tile/step (2500 steps,
    # scripts/profile_blend2.py) — batching tiles amortizes it.
    for j in range(tpb):
        t = pl.program_id(0) * tpb + j
        start = tile_start_ref[t]
        count = jnp.minimum(counts_ref[t], tile_cap)
        n_chunks = (count + k - 1) // k

        # tile_ids maps the local grid step to a GLOBAL tile id so a
        # sharded caller can blend a slice of the grid (parallel/step.py).
        px, py = _pixel_coords(tile_ids_ref[t], tiles_x, tile_size, p)

        color_ref[j] = jnp.zeros((3, p), jnp.float32)
        depth_ref[j] = jnp.zeros((1, p), jnp.float32)

        # double-buffered chunk DMA: prefetch chunk c+1 into the other
        # slot before waiting on chunk c, so HBM latency overlaps the
        # blend math (the serial version spent ~half its time stalled).
        def _copy(c, slot, start=start):
            return pltpu.make_async_copy(
                pack_hbm.at[pl.ds(start + c * k, k), :],
                chunk_vmem.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            _copy(0, 0).start()

        def cond(state):
            c, t_true, t_full = state
            return (c < n_chunks) & (jnp.max(t_full) >= _T_EPS)

        def body(state, count=count, n_chunks=n_chunks, px=px, py=py,
                 _copy=_copy, j=j):
            c, t_true, t_full = state
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                _copy(c + 1, 1 - slot).start()

            _copy(c, slot).wait()
            attrs = chunk_vmem[slot]
            # mask rows beyond the tile's count
            row = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
            in_count = (c * k + row) < count
            attrs = jnp.where(
                jnp.broadcast_to(in_count, attrs.shape), attrs, 0.0)

            alpha, s, t_excl = _chunk_alpha(attrs, px, py, t_full, k, p)
            live = s >= _T_EPS
            w = alpha * t_excl * live.astype(jnp.float32)   # [K, P]

            rgbT = attrs[:, 6:9]                             # [K, 3]
            color_ref[j] += jax.lax.dot_general(
                rgbT, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [3, P]
            depth_ref[j] += jnp.sum(w * attrs[:, 9:10], axis=0,
                                    keepdims=True)

            t_cand = jnp.where(live, s,
                               jnp.broadcast_to(t_true, s.shape))
            t_true = jnp.minimum(jnp.min(t_cand, axis=0, keepdims=True),
                                 t_true)
            t_full = s[-1:, :]
            return c + 1, t_true, t_full

        ones = jnp.ones((1, p), jnp.float32)
        c_exit, t_true, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ones, ones))
        tfinal_ref[j] = t_true

        # early exit leaves exactly one outstanding prefetch (chunk
        # c_exit, started by body c_exit-1); drain it so the semaphore is
        # clean for the next tile
        @pl.when(c_exit < n_chunks)
        def _():
            _copy(c_exit, jax.lax.rem(c_exit, 2)).wait()


def _pick_tpb(num_tiles: int) -> int:
    # _pad_tiles handles non-multiples (padding tiles blend nothing), so
    # always take the largest batch: fewer grid steps = less per-step
    # overhead (the dominant cost at one tile/step — see _fwd_kernel note)
    return 8 if num_tiles >= 8 else 1


def _pad_tiles(tile_start, counts, tile_ids, num_tiles, tpb):
    """Pad the per-tile arrays to a tpb multiple (padding tiles blend
    nothing; their output rows are sliced off)."""
    t_pad = -(-num_tiles // tpb) * tpb
    if t_pad == num_tiles:
        return tile_start[:num_tiles], counts, tile_ids, num_tiles
    extra = t_pad - num_tiles
    tile_start = jnp.concatenate(
        [tile_start[:num_tiles],
         jnp.broadcast_to(tile_start[num_tiles - 1:num_tiles], (extra,))])
    counts = jnp.concatenate([counts, jnp.zeros(extra, counts.dtype)])
    tile_ids = jnp.concatenate(
        [tile_ids, jnp.broadcast_to(tile_ids[-1:], (extra,))])
    return tile_start, counts, tile_ids, t_pad


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_size", "tile_cap",
                     "k_chunk", "interpret"),
)
def _blend_fwd_pallas(sorted_pack, tile_start, counts, tile_ids, tiles_x,
                      tiles_y, tile_size, tile_cap, k_chunk, interpret=False):
    num_tiles = counts.shape[0]
    p = tile_size * tile_size
    k = k_chunk
    tpb = _pick_tpb(num_tiles)
    tile_start, counts_p, tile_ids, t_pad = _pad_tiles(
        tile_start, counts, tile_ids, num_tiles, tpb)
    # pad by one chunk (DMA overrun) and to _AP lanes (DMA alignment)
    sorted_pack = jnp.concatenate(
        [sorted_pack, jnp.zeros((k, sorted_pack.shape[1]),
                                sorted_pack.dtype)], axis=0)
    sorted_pack = jnp.pad(sorted_pack,
                          ((0, 0), (0, _AP - sorted_pack.shape[1])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((tpb, 3, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k, _AP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_size=tile_size, k=k,
        tile_cap=tile_cap, tpb=tpb)
    color, depth, tfinal = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        ),
        interpret=interpret,
    )(tile_start, counts_p, tile_ids, sorted_pack)
    return (color[:num_tiles], depth[:num_tiles, 0],
            tfinal[:num_tiles, 0])


def _bwd_kernel(tile_start_ref, counts_ref, tile_ids_ref, pack_hbm,
                g_color_ref,
                g_depth_ref, g_tfinal_ref, tfinal_ref, color_ref,
                depth_out_ref, grad_init_hbm,
                grad_hbm, chunk_vmem, grad_vmem, sem_in, sem_out, *,
                tiles_x: int, tile_size: int, k: int, tile_cap: int,
                tpb: int):
    """Backward per tile: front-to-back replay with suffix accumulators.

    For pixel p: C = sum_i w_i c_i, D = sum_i w_i z_i, Tf = frozen T.
    dL/dalpha_i = live_i * [ t_excl_i (c_i . gC + z_i . gD)
                  - (S_c_i . gC + S_d_i . gD + Tf*gT) / (1-alpha_i) ]
    where S_*_i are the sums over applied j > i (computed as running
    "behind" accumulators, updated front-to-back: S_i = total - prefix_i).
    The totals come for free from the saved forward outputs:
    tot_c = sum_i w_i (c_i . gC) = C_out . gC and tot_d = D_out * gD — so
    the backward is a single front-to-back replay (no totals pre-pass).
    """
    p = tile_size * tile_size
    d_total = pack_hbm.shape[0]
    for j in range(tpb):
        _bwd_one_tile(j, tile_start_ref, counts_ref, tile_ids_ref, pack_hbm,
                      g_color_ref, g_depth_ref, g_tfinal_ref, tfinal_ref,
                      color_ref, depth_out_ref, grad_hbm, chunk_vmem,
                      grad_vmem, sem_in, sem_out, tiles_x=tiles_x,
                      tile_size=tile_size, k=k, tile_cap=tile_cap, tpb=tpb)


def _bwd_one_tile(j, tile_start_ref, counts_ref, tile_ids_ref, pack_hbm,
                  g_color_ref, g_depth_ref, g_tfinal_ref, tfinal_ref,
                  color_ref, depth_out_ref, grad_hbm, chunk_vmem, grad_vmem,
                  sem_in, sem_out, *, tiles_x: int, tile_size: int, k: int,
                  tile_cap: int, tpb: int):
    t = pl.program_id(0) * tpb + j
    p = tile_size * tile_size
    start = tile_start_ref[t]
    count = jnp.minimum(counts_ref[t], tile_cap)
    n_chunks = (count + k - 1) // k

    px, py = _pixel_coords(tile_ids_ref[t], tiles_x, tile_size, p)
    gC = g_color_ref[j]       # [3, P]
    gD = g_depth_ref[j]       # [1, P]
    gT = g_tfinal_ref[j]      # [1, P]
    t_fin = tfinal_ref[j]     # [1, P]

    # closed-form totals from the saved forward outputs
    tot_c = jnp.sum(color_ref[j] * gC, axis=0, keepdims=True)  # [1, P]
    tot_d = depth_out_ref[j] * gD                               # [1, P]

    def total_cond(state):
        c, t_full, *_ = state
        return (c < n_chunks) & (jnp.max(t_full) >= _T_EPS)

    ones = jnp.ones((1, p), jnp.float32)
    zeros = jnp.zeros((1, p), jnp.float32)

    # double-buffered DMA in AND out (see _fwd_kernel): chunk c+1 streams
    # in while chunk c computes; the grad write-back for chunk c overlaps
    # the next chunk's math and is only waited on when its buffer is
    # about to be reused (chunk c+2) or at drain time.
    def _copy_in(c, slot):
        return pltpu.make_async_copy(
            pack_hbm.at[pl.ds(start + c * k, k), :],
            chunk_vmem.at[slot], sem_in.at[slot])

    def _copy_out(c, slot):
        return pltpu.make_async_copy(
            grad_vmem.at[slot],
            grad_hbm.at[pl.ds(start + c * k, k), :], sem_out.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        _copy_in(0, 0).start()

    # second pass: prefix accumulators -> suffix = total - prefix(<=i)
    def bwd_pass(state):
        c, t_full, pre_c, pre_d = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            _copy_in(c + 1, 1 - slot).start()

        _copy_in(c, slot).wait()
        attrs = chunk_vmem[slot]
        row = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        in_count = jnp.broadcast_to((c * k + row) < count, attrs.shape)
        attrs = jnp.where(in_count, attrs, 0.0)
        alpha, s, t_excl = _chunk_alpha(attrs, px, py, t_full, k, p)
        live = s >= _T_EPS
        livef = live.astype(jnp.float32)
        w = alpha * t_excl * livef

        cdot = jax.lax.dot_general(
            attrs[:, 6:9], gC, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [K, P]
        zdot = attrs[:, 9:10] * gD                         # [K, P]
        contrib_c = w * cdot
        contrib_d = w * zdot
        # prefix including i (cumsum) + carried prefix
        pc_i = pre_c + _cumsum_rows(contrib_c, k, p)       # [K, P]
        pd_i = pre_d + _cumsum_rows(contrib_d, k, p)
        suf_c = tot_c - pc_i                               # sums j > i
        suf_d = tot_d - pd_i

        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = livef * (
            t_excl * (cdot + zdot)
            - (suf_c + suf_d + t_fin * gT) * inv_om)

        # d alpha / d attrs
        dx = attrs[:, 0:1] - px
        dy = attrs[:, 1:2] - py
        ca = attrs[:, 2:3]
        cb = attrs[:, 3:4]
        cc = attrs[:, 4:5]
        op = jnp.maximum(attrs[:, 5:6], 1e-9)
        ga = g_alpha * alpha  # common factor alpha appears in all chain terms
        g_mx = jnp.sum(ga * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
        g_my = jnp.sum(ga * (-(cc * dy + cb * dx)), axis=1, keepdims=True)
        g_ca = jnp.sum(ga * (-0.5 * dx * dx), axis=1, keepdims=True)
        g_cb = jnp.sum(ga * (-dx * dy), axis=1, keepdims=True)
        g_cc = jnp.sum(ga * (-0.5 * dy * dy), axis=1, keepdims=True)
        g_op = jnp.sum(g_alpha * alpha / op, axis=1, keepdims=True)
        g_rgb = jax.lax.dot_general(
            w, gC, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [K, 3]
        g_z = jnp.sum(w * gD, axis=1, keepdims=True)       # [K, 1]

        grad_rows = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_op, g_rgb, g_z], axis=1)
        grad_rows = jnp.pad(grad_rows,
                            ((0, 0), (0, _AP - grad_rows.shape[1])))
        grad_rows = jnp.where(in_count[:, :1], grad_rows, 0.0)

        # chunk c-2 used this same buffer; its write-back must land first
        @pl.when(c >= 2)
        def _():
            _copy_out(c - 2, slot).wait()

        grad_vmem[slot] = grad_rows
        _copy_out(c, slot).start()

        return c + 1, s[-1:, :], pre_c + jnp.sum(contrib_c, 0, keepdims=True), \
            pre_d + jnp.sum(contrib_d, 0, keepdims=True)

    c_exit, *_ = jax.lax.while_loop(total_cond, bwd_pass,
                                    (jnp.int32(0), ones, zeros, zeros))

    # drain: the last (up to) two grad write-backs, plus the one
    # outstanding input prefetch on early exit
    @pl.when(c_exit >= 2)
    def _():
        _copy_out(c_exit - 2, jax.lax.rem(c_exit - 2, 2)).wait()

    @pl.when(c_exit >= 1)
    def _():
        _copy_out(c_exit - 1, jax.lax.rem(c_exit - 1, 2)).wait()

    @pl.when(c_exit < n_chunks)
    def _():
        _copy_in(c_exit, jax.lax.rem(c_exit, 2)).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_size", "tile_cap",
                     "k_chunk", "interpret"),
)
def _blend_bwd_pallas(sorted_pack, tile_start, counts, tile_ids, g_color,
                      g_depth,
                      g_tfinal, tfinal, color, depth_out, tiles_x, tiles_y,
                      tile_size, tile_cap, k_chunk, interpret=False):
    num_tiles = counts.shape[0]
    p = tile_size * tile_size
    k = k_chunk
    tpb = _pick_tpb(num_tiles)
    tile_start, counts_p, tile_ids, t_pad = _pad_tiles(
        tile_start, counts, tile_ids, num_tiles, tpb)
    d_real = sorted_pack.shape[0]
    sorted_pack = jnp.concatenate(
        [sorted_pack, jnp.zeros((k, sorted_pack.shape[1]),
                                sorted_pack.dtype)], axis=0)
    sorted_pack = jnp.pad(sorted_pack,
                          ((0, 0), (0, _AP - sorted_pack.shape[1])))
    d_total = sorted_pack.shape[0]
    grad_init = jnp.zeros((d_total, _AP), jnp.float32)

    def _tile_arr(x, ch):
        x = x.reshape(num_tiles, ch, p)
        if t_pad == num_tiles:
            return x
        return jnp.pad(x, ((0, t_pad - num_tiles), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # pack (HBM)
            pl.BlockSpec((tpb, 3, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 3, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # fwd color
            pl.BlockSpec((tpb, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # fwd depth
            pl.BlockSpec(memory_space=pltpu.ANY),       # grad init (alias)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # grads (HBM)
        scratch_shapes=[
            pltpu.VMEM((2, k, _AP), jnp.float32),
            pltpu.VMEM((2, k, _AP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_size=tile_size, k=k,
        tile_cap=tile_cap, tpb=tpb)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_total, _AP), jnp.float32),
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_start, counts_p, tile_ids, sorted_pack,
      _tile_arr(g_color, 3),
      _tile_arr(g_depth, 1),
      _tile_arr(g_tfinal, 1),
      _tile_arr(tfinal, 1),
      _tile_arr(color, 3),
      _tile_arr(depth_out, 1),
      grad_init)
    return grads[:d_real, :_A]


# ---------------------------------------------------------------------------
# custom-vjp wrapper over the sorted-pack contract
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _blend_sorted_core(sorted_pack, tile_start, counts, tile_ids, tiles_x,
                       tiles_y, tile_size, tile_cap, k_chunk,
                       interpret=False):
    return _blend_fwd_pallas(sorted_pack, tile_start, counts, tile_ids,
                             tiles_x, tiles_y, tile_size, tile_cap, k_chunk,
                             interpret)


def _fwd_rule(sorted_pack, tile_start, counts, tile_ids, tiles_x, tiles_y,
              tile_size, tile_cap, k_chunk, interpret):
    out = _blend_fwd_pallas(sorted_pack, tile_start, counts, tile_ids,
                            tiles_x, tiles_y, tile_size, tile_cap, k_chunk,
                            interpret)
    return out, (sorted_pack, tile_start, counts, tile_ids, out[2], out[0],
                 out[1])


def _bwd_rule(tiles_x, tiles_y, tile_size, tile_cap, k_chunk, interpret,
              res, g):
    sorted_pack, tile_start, counts, tile_ids, tfinal, color, depth_out = res
    g_color, g_depth, g_tfinal = g
    grads = _blend_bwd_pallas(
        sorted_pack, tile_start, counts, tile_ids, g_color, g_depth,
        g_tfinal, tfinal, color, depth_out, tiles_x, tiles_y, tile_size,
        tile_cap, k_chunk, interpret)
    return grads, None, None, None


_blend_sorted_core.defvjp(_fwd_rule, _bwd_rule)


def blend_sorted_pallas(sorted_pack, tile_start, counts, tiles_x, tiles_y,
                        tile_size, tile_cap, k_chunk, interpret=False,
                        tile_ids=None):
    """[D, A] sorted pack -> (color [T,3,P], depth [T,P], final_t [T,P]).

    ``tile_ids`` (optional, [T] int32) maps each grid step to a GLOBAL tile
    id; pass it when blending a slice of the tile grid (sharded step) so
    pixel coordinates come from the global grid position. Defaults to the
    identity (full-grid blend).
    """
    if tile_ids is None:
        tile_ids = jnp.arange(counts.shape[0], dtype=jnp.int32)
    return _blend_sorted_core(sorted_pack, tile_start, counts, tile_ids,
                              tiles_x, tiles_y, tile_size, tile_cap, k_chunk,
                              interpret)
