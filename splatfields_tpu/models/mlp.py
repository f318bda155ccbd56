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
        h = h_in
        n_layers = len(dims_in)
        for i, (fin, fout, rank) in enumerate(dims_in):
            layer = ResFieldLinear(
                in_features=fin, out_features=fout, rank=rank,
                capacity=self.n_frames if rank else 0,
                name=f"net_{i}")
            h = act(layer(h, frame_id=frame_id))
            if i in self.skips and i != n_layers - 1:
                h = jnp.concatenate([h_in, h], axis=-1)
        return _out_act(self.out_activation)(h)
