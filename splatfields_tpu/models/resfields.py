"""ResField temporally-conditioned Linear layers (flax).

Parity target: reference ``utils/resfields.py`` — ``Linear`` computing
``y = x (W + dW_t)^T + b`` with the per-time delta ``dW_t`` low-rank
factored. The configuration the reference actually trains with is
``compression='vm', mode='lookup', fuse_mode='add'`` (SURVEY 2.16):
``dW_t = weights_t[frame_id] @ matrix_t`` reshaped to [F_out, F_in].

TPU note: unlike the reference — which materializes the delta for ALL
capacity frames every call and then indexes one (``resfields.py:222-239,
293-300``) — we contract only the requested frame's coefficient row with
``matrix_t``: one [R] x [R, F_out*F_in] matvec on the MXU, identical math.

Implemented compressions: ``vm`` (modes lookup / interpolation /
interpolation_siren), ``vm_cum``, ``vm_noweight``, ``none``, ``none_cum``
with fuse add/mul. The remaining reference zoo entries (cp/tucker via
tensorly, loe, vm_attention, chunked vm, lora_3/lora_ngp — all unused by
the released configs, ``resfields.py:126-183,240-289``) raise
NotImplementedError with a pointer here.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from splatfields_tpu.models.initializers import (
    normal_scaled,
    siren_first_layer,
    siren_hidden_layer,
    torch_linear_bias,
    torch_linear_weight,
)

_SUPPORTED = ("vm", "vm_cum", "vm_noweight", "none", "none_cum")


class SirenMLP(nn.Module):
    """sin(30x) MLP (reference ``utils/time_utils.py:76-121``)."""
    out_features: int
    hidden_features: int = 128
    num_hidden_layers: int = 2
    out_activation: str = "none"

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_features] * self.num_hidden_layers + [self.out_features]
        for i, d in enumerate(dims):
            init = siren_first_layer if i == 0 else siren_hidden_layer
            fan_in = x.shape[-1]
            x = nn.Dense(d, kernel_init=init,
                         bias_init=torch_linear_bias(fan_in))(x)
            if i < len(dims) - 1:
                x = jnp.sin(30.0 * x)
        return _out_act(self.out_activation)(x)


def _out_act(name: str):
    return {
        "none": lambda x: x,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "softplus": jax.nn.softplus,
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "elu": jax.nn.elu,
        "normalize": lambda x: x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12),
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    }[name]


class ResFieldLinear(nn.Module):
    """Linear with optional low-rank temporal weight residuals."""
    in_features: int
    out_features: int
    rank: int = 0
    capacity: int = 0
    mode: str = "lookup"
    compression: str = "vm"
    fuse_mode: str = "add"
    coeff_ratio: float = 1.0

    def setup(self):
        if self.compression not in _SUPPORTED:
            raise NotImplementedError(
                f"compression '{self.compression}' is not implemented in the "
                "TPU build (unused by released SplatFields configs; see "
                "models/resfields.py docstring)")
        self.weight = self.param(
            "weight", torch_linear_weight, (self.in_features, self.out_features))
        self.bias = self.param(
            "bias", torch_linear_bias(self.in_features), (self.out_features,))
        self.active = (
            self.rank is not None and self.rank > 0
            and self.capacity is not None and self.capacity > 0
        )
        if not self.active:
            return
        n_coefs = int(self.capacity * self.coeff_ratio)
        numel = self.in_features * self.out_features
        if self.compression in ("vm", "vm_cum"):
            if self.fuse_mode == "mul":
                w_init = lambda k, s, d=jnp.float32: jnp.full(s, 1.0 / self.rank, d)
                m_init = lambda k, s, d=jnp.float32: jnp.ones(s, d)
            else:
                w_init = normal_scaled(0.01)
                m_init = normal_scaled(0.01)
            self.matrix_t = self.param("matrix_t", m_init, (self.rank, numel))
            if self.mode == "interpolation_siren":
                self.weights_t_siren = SirenMLP(
                    out_features=self.rank, hidden_features=128,
                    num_hidden_layers=2)
            else:
                self.weights_t = self.param("weights_t", w_init, (n_coefs, self.rank))
        elif self.compression == "vm_noweight":
            self.matrix_t = self.param(
                "matrix_t", normal_scaled(1e-6), (self.rank, numel))
        elif self.compression in ("none", "none_cum"):
            self.matrix_t = self.param(
                "matrix_t", lambda k, s, d=jnp.float32: jnp.zeros(s, d),
                (self.capacity, numel))

    def _fuse(self, delta, base_flat):
        if self.fuse_mode == "add":
            return delta + base_flat
        if self.fuse_mode == "mul":
            return delta * base_flat
        return delta  # 'none'

    def _delta_weight(self, input_time=None, frame_id=None) -> jnp.ndarray:
        """Effective [F_in, F_out] weight for one frame (or [N, F_in, F_out]
        for interpolation modes with per-sample time)."""
        base = self.weight  # [in, out]
        base_flat = base.reshape(-1)  # row-major (in, out)
        numel = base_flat.shape[0]

        if self.compression in ("vm", "vm_cum"):
            if self.mode == "interpolation":
                # linear interp of coefficient rows over continuous time in
                # [-1, 1] with border padding (reference :223-233)
                t = (input_time.reshape(-1) + 1.0) / 2.0 * (self.capacity - 1)
                t = jnp.clip(t, 0.0, self.capacity - 1)
                t0 = jnp.floor(t).astype(jnp.int32)
                t1 = jnp.minimum(t0 + 1, self.capacity - 1)
                f = (t - t0)[:, None]
                wt = self.weights_t[t0] * (1 - f) + self.weights_t[t1] * f  # [N,R]
            elif self.mode == "interpolation_siren":
                wt = self.weights_t_siren(input_time.reshape(-1, 1))  # [N,R]
            else:  # lookup
                wt_all = self.weights_t
                if self.compression == "vm_cum":
                    wt_all = jnp.cumsum(wt_all, axis=0)
                wt = wt_all[frame_id]  # [R]
            if self.compression == "vm_cum" and self.mode != "lookup":
                wt = jnp.cumsum(wt, axis=0)
            # matrix_t layout matches torch's (out, in) flatten; our base is
            # (in, out) row-major — keep matrix_t in (out*in) and transpose.
            delta_oi = jnp.matmul(wt, self.matrix_t, precision="highest")
            if delta_oi.ndim == 1:
                delta = delta_oi.reshape(self.out_features, self.in_features).T
                return self._fuse(delta.reshape(-1), base_flat).reshape(
                    self.in_features, self.out_features)
            delta = delta_oi.reshape(-1, self.out_features, self.in_features)
            delta = jnp.swapaxes(delta, -1, -2)  # [N, in, out]
            return self._fuse(delta.reshape(delta.shape[0], -1),
                              base_flat[None]).reshape(
                -1, self.in_features, self.out_features)
        if self.compression == "vm_noweight":
            # reference quirk (resfields.py:272-274): the base weight is
            # fused into EVERY rank column before the sum over rank, so the
            # effective weight is sum_r fuse(matrix_t[r], W) — for 'add'
            # that is rank*W + sum(matrix_t), not W + sum(matrix_t).
            # Verified by tests/test_reference_parity.py transplant.
            fused = self._fuse(
                jnp.swapaxes(self.matrix_t, 0, 1),  # [numel, R]
                base.T.reshape(-1, 1))  # torch (out,in) flatten
            delta_oi = jnp.sum(fused, axis=1)
            return delta_oi.reshape(
                self.out_features, self.in_features).T
        if self.compression == "none":
            delta = self.matrix_t[frame_id].reshape(
                self.out_features, self.in_features).T
            return self._fuse(delta.reshape(-1), base_flat).reshape(
                self.in_features, self.out_features)
        if self.compression == "none_cum":
            # cumulative deltas scaled by 1/250 with the base as frame 0
            # (reference :276-279)
            mat = jnp.asarray(self.matrix_t) / 250.0  # [C, out*in]
            mat = mat.at[0].set(0.0)
            cum = jnp.cumsum(mat, axis=0)[frame_id]
            delta = cum.reshape(self.out_features, self.in_features).T
            return (base_flat + delta.reshape(-1)).reshape(
                self.in_features, self.out_features)
        raise AssertionError

    def __call__(self, x: jnp.ndarray, input_time=None,
                 frame_id: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if not self.active or (frame_id is None and input_time is None):
            if x.dtype == jnp.bfloat16:
                # mixed-precision activations (GeneralMLP bf16 knob): dot
                # in bf16 with f32 accumulation, f32 bias
                return jnp.matmul(
                    x, self.weight.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + self.bias
            return jnp.matmul(x, self.weight) + self.bias
        w = self._delta_weight(input_time=input_time, frame_id=frame_id)
        if w.ndim == 2:
            return jnp.matmul(x, w) + self.bias
        # per-sample weights: [N, in] x [N, in, out]
        return jnp.einsum("ni,nio->no", x, w) + self.bias
