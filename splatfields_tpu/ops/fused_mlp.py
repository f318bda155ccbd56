"""Fully-fused multi-head MLP Pallas kernel for the SplatFields field heads.

Why: the field's rank-0 GeneralMLP heads (reference ``utils/time_utils.py:
123-191,350-417``) are ~25 small [N,*]x[*,128|64] matmuls over N~=1e5
points. Run layer-by-layer under XLA, every intermediate [N,128] activation
round-trips HBM (~1.4 GB/step forward alone), so the stage is
bandwidth-bound at ~8 ms despite needing only ~60 GFLOP. This kernel keeps
a chunk of points' activations in VMEM for the whole head stack — the TPU
analog of tiny-cuda-nn's FullyFusedMLP, which the reference leans on for
its NGP path (``scene/ngpFields.py:46-54``) — turning the stage
compute-bound.

Semantics are exactly GeneralMLP's (quirks preserved):
- embedded input = [pe(xyz) | feat]; each head reads a PREFIX of the shared
  max-multires embedding (the octave layout is a prefix code) + the feature
  block;
- skip layers concatenate the embedded input in front (``h = [h_in, h]``);
- leaky_relu(0.01) after EVERY layer including the last (out_act applied by
  the caller).

Matmuls cast inputs to a configurable ``compute_dtype`` (bf16 on TPU —
identical to XLA's default TPU matmul precision the flax path uses) and
accumulate in f32 (``preferred_element_type``).

Backward is a custom VJP: one kernel recomputes the chunk's forward in VMEM
(nothing saved but the inputs), backprops all heads, emits d_emb/d_feat per
chunk and accumulates dW/db across the sequential grid in VMEM-resident
output blocks (constant index_map). Weight-gradient parity with the flax
path is asserted in tests/test_fused_mlp.py (interpret mode).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA = 0.01  # GeneralMLP's leaky_relu slope (reference time_utils.py:184)


class LayerSpec(NamedTuple):
    fin: int
    fout: int
    row_off: int      # row offset into the packed [R, 128] weight matrix
    bias_idx: int     # row into the packed [L, 128] bias matrix
    skip_after: bool  # concat the embedded input after this layer


class HeadSpec(NamedTuple):
    name: str         # param-tree key, e.g. "mlp_deform"
    emb_cols: int     # prefix of the shared embedding this head consumes
    layers: tuple     # tuple[LayerSpec]
    out_dim: int


class Plan(NamedTuple):
    heads: tuple      # tuple[HeadSpec]
    n_rows: int       # packed weight rows (multiple of 8 per block)
    n_bias: int
    emb_dim: int
    feat_dim: int


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def build_plan(head_cfgs: Sequence[dict], emb_dim: int, feat_dim: int) -> Plan:
    """head_cfgs: dicts with name, multires_cols, hidden, depth, skips, out.

    Layer dims replicate GeneralMLP.dims_in for rank 0 (mlp.py:134-146):
    net_0: h_in -> W; net_{1+i}: W (+h_in at skips) -> W; net_last: W -> out.
    The application loop concatenates h_in after applying layer index s for
    s in skips (mlp.py:151-158).
    """
    heads = []
    row = 0
    bias = 0
    for cfg in head_cfgs:
        h_in = cfg["emb_cols"] + feat_dim
        W, H, out = cfg["hidden"], cfg["depth"], cfg["out"]
        skips = set(cfg["skips"])
        dims = [(h_in, W)]
        for i in range(H):
            fin = W + (h_in if i in skips else 0)
            dims.append((fin, W))
        dims.append((W, out))
        n_layers = len(dims)
        layers = []
        for i, (fin, fout) in enumerate(dims):
            skip_after = i in skips and i != n_layers - 1
            layers.append(LayerSpec(fin, fout, row, bias, skip_after))
            row += _round8(fin)
            bias += 1
        heads.append(HeadSpec(cfg["name"], cfg["emb_cols"], tuple(layers),
                              dims[-1][1]))
    return Plan(tuple(heads), row, bias, emb_dim, feat_dim)


def plan_from_module(net, mode: str) -> Plan:
    """Build the fused plan for a SplatFields module. mode: 'deform' (the
    canonicalization head, runs on pe(xyz_in)) or 'downstream' (rgb + geo
    heads on pe(xyz_can)). Requires rank-0 heads (composition_rank == 0 or
    n_frames == 0) and point-conditioned geometry heads."""
    from splatfields_tpu.models.mlp import embed_dim
    F = net.feat_dim
    if mode == "deform":
        cfgs = [dict(name="mlp_deform", emb_cols=embed_dim(net.deform_multires),
                     hidden=net.deform_w, depth=net.deform_d,
                     skips=net.deform_skips, out=3)]
        E = embed_dim(net.deform_multires)
    else:
        max_mr = max(net.rgb_multires, net.scale_multires,
                     net.opacity_multires, net.rotation_multires)
        E = embed_dim(max_mr)
        cfgs = [
            dict(name="mlp_rgb", emb_cols=embed_dim(net.rgb_multires),
                 hidden=net.rgb_w, depth=net.rgb_d, skips=net.rgb_skips,
                 out=net.rgb_w if net.use_view_dep_rgb else 3),
            dict(name="mlp_scale", emb_cols=embed_dim(net.scale_multires),
                 hidden=net.scale_w, depth=net.scale_d,
                 skips=net.scale_skips, out=3),
            dict(name="mlp_opacity", emb_cols=embed_dim(net.opacity_multires),
                 hidden=net.opacity_w, depth=net.opacity_d,
                 skips=net.opacity_skips, out=1),
            dict(name="mlp_rotation",
                 emb_cols=embed_dim(net.rotation_multires),
                 hidden=net.rotation_w, depth=net.rotation_d,
                 skips=net.rotation_skips, out=4),
        ]
    return build_plan(cfgs, E, F)


def pack_params(params: dict, plan: Plan, dtype=jnp.float32):
    """Pack per-head {net_i: {weight [in,out], bias [out]}} trees into one
    [R, 128] weight matrix + [L, 128] bias matrix (row offsets per plan).

    Built as ONE concatenate (layer blocks are consecutive by
    construction) — a dynamic_update_slice per layer costs one kernel
    dispatch each on the TPU runtime, ~60 per step."""
    w_parts, b_parts = [], []
    for head in plan.heads:
        tree = params[head.name]
        for i, L in enumerate(head.layers):
            wi = tree[f"net_{i}"]["weight"].astype(dtype)
            bi = tree[f"net_{i}"]["bias"].astype(jnp.float32)
            w_parts.append(jnp.pad(wi, ((0, _round8(L.fin) - L.fin),
                                        (0, 128 - L.fout))))
            b_parts.append(jnp.pad(bi, (0, 128 - L.fout))[None])
    return jnp.concatenate(w_parts, 0), jnp.concatenate(b_parts, 0)


def unpack_grads(dw: jnp.ndarray, db: jnp.ndarray, plan: Plan) -> dict:
    out = {}
    for head in plan.heads:
        tree = {}
        for i, L in enumerate(head.layers):
            tree[f"net_{i}"] = {
                "weight": dw[L.row_off:L.row_off + L.fin, :L.fout],
                "bias": db[L.bias_idx, :L.fout],
            }
        out[head.name] = tree
    return out


def _head_input(head: HeadSpec, emb, feat):
    parts = [emb[:, :head.emb_cols]]
    if feat is not None:
        parts.append(feat)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _leaky(x):
    return jnp.where(x >= 0, x, _ALPHA * x)


def _layer_fwd(h, w_ref, b_ref, L: LayerSpec, cdt):
    w = w_ref[L.row_off:L.row_off + L.fin, :L.fout]
    b = b_ref[L.bias_idx, :L.fout]
    y = jax.lax.dot(h.astype(cdt), w.astype(cdt),
                    preferred_element_type=jnp.float32)
    return _leaky(y + b[None, :])


def _fwd_kernel(plan: Plan, cdt, has_feat, emb_ref, feat_ref, w_ref, b_ref,
                *out_refs):
    emb = emb_ref[:]
    feat = feat_ref[:] if has_feat else None
    for head, out_ref in zip(plan.heads, out_refs):
        h_in = _head_input(head, emb, feat)
        h = h_in
        for L in head.layers:
            h = _layer_fwd(h, w_ref, b_ref, L, cdt)
            if L.skip_after:
                h = jnp.concatenate([h_in, h], axis=1)
        out_ref[:] = h


def _bwd_kernel(plan: Plan, cdt, has_feat, emb_ref, feat_ref, w_ref, b_ref,
                *rest):
    n_heads = len(plan.heads)
    g_refs = rest[:n_heads]
    demb_ref, dfeat_ref, dw_ref, db_ref = rest[n_heads:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    emb = emb_ref[:]
    feat = feat_ref[:] if has_feat else None
    d_emb = jnp.zeros_like(emb)
    d_feat = jnp.zeros_like(feat) if has_feat else None

    for head, g_ref in zip(plan.heads, g_refs):
        h_in = _head_input(head, emb, feat)
        # recompute forward, keeping each layer's INPUT — stored in the
        # compute dtype: the only consumers are the dW matmuls (which cast
        # to cdt anyway) and the leaky_relu sign masks (sign-exact in
        # bf16), so this halves the kernel's VMEM high-water mark
        inputs = []
        h = h_in
        for L in head.layers:
            inputs.append(h.astype(cdt))
            h = _layer_fwd(h, w_ref, b_ref, L, cdt)
            if L.skip_after:
                h = jnp.concatenate([h_in, h], axis=1)
        # backprop
        g = g_ref[:]          # cotangent on the head output (post leaky)
        d_h_in = jnp.zeros_like(h_in)
        for i in reversed(range(len(head.layers))):
            L = head.layers[i]
            inp = inputs[i]
            # post-activation output of layer i (sign == pre-act sign)
            if i + 1 < len(head.layers):
                nxt = inputs[i + 1]
                out = nxt[:, h_in.shape[1]:] if L.skip_after else nxt
            else:
                out = h
            # sign mask in f32 — v5e Mosaic rejects bf16 vector compares
            g = jnp.where(out.astype(jnp.float32) >= 0, g, _ALPHA * g)
            dw_ref[L.row_off:L.row_off + L.fin, :L.fout] += (
                jax.lax.dot_general(
                    inp.astype(cdt), g.astype(cdt),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            db_ref[L.bias_idx, :L.fout] += jnp.sum(g, axis=0)
            w = w_ref[L.row_off:L.row_off + L.fin, :L.fout]
            g = jax.lax.dot_general(
                g.astype(cdt), w.astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [B, fin]
            if i > 0 and head.layers[i - 1].skip_after:
                d_h_in = d_h_in + g[:, :h_in.shape[1]]
                g = g[:, h_in.shape[1]:]
        d_h_in = d_h_in + g
        contrib = d_h_in[:, :head.emb_cols]
        if head.emb_cols < plan.emb_dim:
            contrib = jnp.pad(
                contrib, ((0, 0), (0, plan.emb_dim - head.emb_cols)))
        d_emb = d_emb + contrib
        if has_feat:
            d_feat = d_feat + d_h_in[:, head.emb_cols:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        demb_ref[:] = jnp.zeros_like(demb_ref)  # keep Mosaic happy on pad
    demb_ref[:] = d_emb
    if has_feat:
        dfeat_ref[:] = d_feat


def _block(cols):
    return lambda B: pl.BlockSpec((B, cols), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_heads(plan: Plan, block: int, compute_dtype, interpret,
                emb, feat, w, b):
    """Run all plan heads over [N, E] embeddings (+[N, F] features).

    Returns a tuple of per-head outputs (post the every-layer leaky_relu,
    BEFORE each head's out_activation). N is padded to ``block`` internally.
    feat may be a [N, 0] array when the plan has no feature input.
    """
    return _fused_fwd_call(plan, block, compute_dtype, interpret,
                           emb, feat, w, b)


def _pad_n(x, block):
    n = x.shape[0]
    npad = -(-n // block) * block
    if npad == n:
        return x
    return jnp.pad(x, ((0, npad - n), (0, 0)))


def _fused_fwd_call(plan, block, cdt, interpret, emb, feat, w, b):
    n = emb.shape[0]
    has_feat = plan.feat_dim > 0
    emb_p = _pad_n(emb, block)
    feat_p = _pad_n(feat, block) if has_feat else jnp.zeros(
        (emb_p.shape[0], 8), emb.dtype)
    grid = emb_p.shape[0] // block
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, plan, cdt, has_feat),
        grid=(grid,),
        in_specs=[
            _block(plan.emb_dim)(block),
            _block(feat_p.shape[1])(block),
            _const(w.shape),
            _const(b.shape),
        ],
        out_specs=tuple(_block(h.out_dim)(block) for h in plan.heads),
        out_shape=tuple(
            jax.ShapeDtypeStruct((emb_p.shape[0], h.out_dim), jnp.float32)
            for h in plan.heads),
        interpret=interpret,
    )(emb_p, feat_p, w, b)
    return tuple(o[:n] for o in outs)


def _fused_vjp_fwd(plan, block, cdt, interpret, emb, feat, w, b):
    outs = _fused_fwd_call(plan, block, cdt, interpret, emb, feat, w, b)
    return outs, (emb, feat, w, b)


def _fused_vjp_bwd(plan, block, cdt, interpret, res, gs):
    emb, feat, w, b = res
    n = emb.shape[0]
    has_feat = plan.feat_dim > 0
    # the backward holds every layer's recomputed input for the chunk, so
    # its VMEM high-water mark is ~4x the forward's — halve the block
    # (2048 fwd / 1024 bwd fits the 16 MB scope; 2048 bwd OOMs at 28.8 MB)
    block = max(block // 2, 256)
    emb_p = _pad_n(emb, block)
    feat_p = _pad_n(feat, block) if has_feat else jnp.zeros(
        (emb_p.shape[0], 8), emb.dtype)
    gs_p = tuple(_pad_n(g, block) for g in gs)
    grid = emb_p.shape[0] // block
    feat_cols = feat_p.shape[1]
    d_emb, d_feat, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, plan, cdt, has_feat),
        grid=(grid,),
        in_specs=[
            _block(plan.emb_dim)(block),
            _block(feat_cols)(block),
            _const(w.shape),
            _const(b.shape),
        ] + [_block(h.out_dim)(block) for h in plan.heads],
        out_specs=(
            _block(plan.emb_dim)(block),
            _block(feat_cols)(block),
            _const(w.shape),
            _const(b.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(emb_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(feat_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.shape, jnp.float32),
        ),
        interpret=interpret,
    )(emb_p, feat_p, w, b, *gs_p)
    d_feat_out = d_feat[:n] if has_feat else jnp.zeros_like(feat)
    return d_emb[:n], d_feat_out, dw.astype(w.dtype), db.astype(b.dtype)


fused_heads.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
