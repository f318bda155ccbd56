"""Positional embedders and the GeneralMLP field head (flax).

Parity targets (reference ``utils/time_utils.py``):
- ``get_embedder``/``Embedder`` (:9-57): include-input + log-spaced octaves,
  (sin, cos) per frequency.
- ``GeneralMLP`` (:123-191) with its quirks preserved exactly:
  * positional embedding applied to the raw ``xyz`` argument, extra features
    concatenated after;
  * skip connections concatenate the *embedded* input in front
    (``h = cat([h_in, h])``) after layer index i in ``skips``;
  * ResField ranks only on net indices 2..H (the first created hidden layer
    gets rank 0 — ``_create_lin`` vs ``resfield_layers``, :136-160);
  * the activation (leaky_relu) is applied to EVERY layer including the
    last, and ``out_act`` is applied on top of that (:184-190).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.models.resfields import ResFieldLinear, _out_act


def embed_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def positional_embed(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """[..., D] -> [..., D * (1 + 2*multires)]; identity if multires == 0.

    Frequencies 2^0 .. 2^(multires-1); per frequency order (sin, cos)
    matching reference Embedder.create_embedding_fn.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def fused_mlp_heads(params_list, skips_list, h_in_list,
                    act=lambda x: jax.nn.leaky_relu(x, 0.01)):
    """Run several rank-0 GeneralMLP heads as ONE batched einsum per depth
    level instead of one small matmul per (head, layer).

    Why: the SplatFields geo heads are three 64-wide MLPs over the same
    N=1e5 input — 17 separate [N,64]x[64,64] matmuls whose per-kernel
    dispatch dominates on TPU. Batching the heads at each depth level into
    a single [A,N,W]x[A,W,W] dot_general keeps the math BIT-IDENTICAL
    (weights are only stacked, never mixed; padding columns multiply zero
    weights) while cutting the kernel count to one per level
    (tests/test_mlp.py asserts equality vs the sequential GeneralMLP).

    Args:
        params_list: per-head param dicts ``{"net_0": {"weight","bias"},…}``
            (the ResFieldLinear rank-0 layout). Heads may have different
            depths and input widths, but equal hidden width.
        skips_list: per-head GeneralMLP ``skips`` (dims_in indices after
            which ``[h_in, h]`` is concatenated).
        h_in_list: per-head embedded inputs [N, emb_in_j].
        act: the per-layer activation (leaky_relu for every SplatFields
            head, applied to EVERY layer including the last — reference
            ``utils/time_utils.py:184-190``).

    Returns: per-head outputs BEFORE the head's out_activation.
    """
    n = len(params_list)
    n_layers = [len(p) for p in params_list]
    hs = list(h_in_list)
    outs = [None] * n
    for lvl in range(max(n_layers)):
        active = [j for j in range(n) if lvl < n_layers[j]]
        Ws = [params_list[j][f"net_{lvl}"]["weight"] for j in active]
        bs = [params_list[j][f"net_{lvl}"]["bias"] for j in active]
        if len(active) == 1:
            new = {active[0]: act(hs[active[0]] @ Ws[0] + bs[0])}
        else:
            wi = max(w.shape[0] for w in Ws)
            wo = max(w.shape[1] for w in Ws)
            h_st = jnp.stack([
                jnp.pad(hs[j], ((0, 0), (0, wi - hs[j].shape[1])))
                for j in active])
            w_st = jnp.stack([
                jnp.pad(w, ((0, wi - w.shape[0]), (0, wo - w.shape[1])))
                for w in Ws])
            b_st = jnp.stack([jnp.pad(b, (0, wo - b.shape[0])) for b in bs])
            out = act(jnp.einsum("ani,aio->ano", h_st, w_st)
                      + b_st[:, None, :])
            new = {j: out[k][:, : Ws[k].shape[1]]
                   for k, j in enumerate(active)}
        for j, h in new.items():
            if lvl == n_layers[j] - 1:
                outs[j] = h
            elif lvl in skips_list[j]:
                hs[j] = jnp.concatenate([h_in_list[j], h], axis=-1)
            else:
                hs[j] = h
    return outs


class GeneralMLP(nn.Module):
    in_features: int = 3
    out_features: int = 3
    hidden_features: int = 128
    num_hidden_layers: int = 8
    skips: Sequence[int] = (4,)
    multires: int = 6
    out_activation: str = "none"
    act: str = "relu"
    composition_rank: int = 0
    n_frames: int = 100

    @nn.compact
    def __call__(self, xyz, xyz_feat=None, frame_id=None, xyz_embedded=None):
        """``xyz_embedded`` optionally supplies a precomputed positional
        embedding of xyz at >= this head's multires (the leading columns
        are exactly this head's embedding — the octave layout is a prefix
        code), so the sin/cos sweep is shared across heads."""
        emb_in = self.in_features - 3 + embed_dim(self.multires, 3)
        if xyz_embedded is not None and self.multires > 0:
            h_in = xyz_embedded[:, : embed_dim(self.multires, xyz.shape[-1])]
        else:
            h_in = positional_embed(xyz, self.multires)
        if xyz_feat is not None:
            h_in = jnp.concatenate([h_in, xyz_feat], axis=-1)

        H = self.num_hidden_layers
        # net[0]: in -> W (no rank); net[1+i] for i in 0..H-1; net[-1]: W -> out
        # rank goes to created layers with layer_id >= 1 (reference quirk)
        dims_in = []
        dims_in.append((h_in.shape[-1], self.hidden_features, 0))
        for i in range(H):
            fin = self.hidden_features
            if i in self.skips:
                fin = self.hidden_features + emb_in
            rank = self.composition_rank if i >= 1 else 0
            cap = self.n_frames if (rank and self.n_frames > 0) else 0
            dims_in.append((fin, self.hidden_features, rank if cap else 0))
        dims_in.append((self.hidden_features, self.out_features, 0))

        act = _out_act(self.act)
        # bf16 INTER-LAYER activations (SPLATFIELDS_MLP_BF16=on/off/auto;
        # default auto = ON for static fields, OFF when n_frames > 0):
        # dots still accumulate f32 — ResFieldLinear follows x.dtype with
        # preferred_element_type f32 — and params/head outputs stay f32.
        # The MLP stack is activation-HBM bound at N=1e5 (trace: ~5.7 ms
        # of [N,128] f32 round-trips); halving the bytes measured
        # 50.7 -> 47.9 ms on bench with the 300-iter PSNR gate GREEN
        # (quality_gate.json: 21.6 vs 20.2 dB f32 baseline) and the
        # 3000-iter static pair GREEN too (quality_longrun.json: 30.87 vs
        # 27.82 dB). On the 4D path the same deviation REGRESSES quality
        # (quality_longrun_4d.json: 18.67 bf16 vs 20.91 f32 dB @ 3000
        # iters, owlii4d — error compounds through the per-frame ResField
        # weight composition), so n_frames > 0 defaults to f32. The
        # documented numerics deviation from the all-f32 reference; the
        # CPU test suite pins f32 (tests/conftest.py) because the
        # weight-transplant parity tests define math parity at f32.
        import os
        env = os.environ.get("SPLATFIELDS_MLP_BF16", "auto")
        if env in ("on", "off"):
            bf16 = env == "on"
        else:
            bf16 = self.n_frames == 0
        h = h_in.astype(jnp.bfloat16) if bf16 else h_in
        skip_in = h
        n_layers = len(dims_in)
        for i, (fin, fout, rank) in enumerate(dims_in):
            layer = ResFieldLinear(
                in_features=fin, out_features=fout, rank=rank,
                capacity=self.n_frames if rank else 0,
                name=f"net_{i}")
            h = act(layer(h, frame_id=frame_id))
            if bf16:
                h = h.astype(jnp.bfloat16)
            if i in self.skips and i != n_layers - 1:
                h = jnp.concatenate([skip_in, h], axis=-1)
        return _out_act(self.out_activation)(h.astype(jnp.float32))
