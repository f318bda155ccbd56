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
The same one-frame contraction shape is used for every zoo member below
where the math allows it (cp/tucker contract their frame factor row
first). Exception: ``vm_cum_mat`` applies selu BETWEEN the rank
contraction and the frame sum, so its [capacity, F_out*F_in] product
must materialize — the masked matvec only replaces the cumsum-then-index
(upstream additionally materializes the full cumsum, :251-256).

Implemented compressions (the full reference zoo, ``resfields.py:40``):
``vm`` (modes lookup / interpolation / interpolation_siren, plus the
chunked variant via ``chunk_size``/``chunk_strategy``), ``vm_cum``,
``vm_cum_mat``, ``vm_noweight``, ``vm_attention``, ``loe``, ``mm_tensor``,
``none``, ``none_cum``, ``resnet``, ``cp``, ``tucker``, ``lora_3``,
``lora_ngp``. Notes on the tail (none are reachable from released configs
— upstream's ``--compression`` flag is declared but never threaded into
``resfields.Linear``, ``utils/time_utils.py:151-160``):

- ``cp``/``tucker``: upstream inits via tensorly then overwrites every
  value with ``0.01*randn_like`` (``resfields.py:302-310``) — tensorly is
  absent here (and optional upstream), so we draw the same-shaped 0.01
  normals directly. Tucker factor ranks are ``min(rank, dim)`` per mode
  (the attainable HOSVD rank tensorly's validate_tucker_rank enforces).
- ``lora_ngp``: upstream uses two tinycudann NetworkWithInputEncoding
  nets (``resfields.py:96-124``); we use the same-config native
  HashGridEncoder + 64-wide ReLU MLP (models/encoders.py). Documented
  equivalent — weight transplant is impossible (tcnn hash layout).
  Upstream also sizes BOTH nets' outputs as ``weight.shape[1]`` (F_in),
  so its ``bases`` is F_in-wide and ``shared_output + output`` crashes
  whenever F_in != F_out (``resfields.py:114-124,364-371``) — square
  layers only. We give ``ngp_bases`` ``out_features`` (the evident
  intent; identical to upstream on the square layers that upstream can
  actually run).
- ``chunk_weights`` init: upstream copies ``0.01*weight`` (the SAME draw
  as the base weight, ``resfields.py:68``); flax params init from
  independent keys, so we draw a fresh 0.01-scaled kaiming tensor.
  Training-equivalent in distribution; transplant tests overwrite it.
- ``loe`` + ``mode='lookup'``: refused with NotImplementedError. Upstream
  builds PER-SAMPLE weights from input_time and then, in lookup mode,
  indexes that stack by ``frame_id`` over the SAMPLE axis
  (``resfields.py:293-300``) — semantically broken (crashes whenever
  frame_id >= N). Only the interpolation modes are supported here.
- chunked ``vm`` + interpolation modes: refused with NotImplementedError
  (frame_id required); upstream likewise only ever indexes the chunk
  tables by integer frame_id (``resfields.py:181-219``).
- chunked ``shared``/``both`` shape quirk: upstream's
  ``view(-1, *weight.shape)`` sees the 3D chunked weight, skips the
  ``frame_id`` lookup and returns a [capacity, S, F_out] all-frames batch
  (``resfields.py:294-300``). We select the requested frame (the evident
  intent); the parity test checks row ``frame_id`` of upstream's output.
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

_SUPPORTED = (
    "vm", "vm_cum", "vm_cum_mat", "vm_noweight", "vm_attention", "loe",
    "mm_tensor", "none", "none_cum", "resnet", "cp", "tucker",
    "lora_3", "lora_ngp",
)


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


def _trilinear_sample_border(vol, coords):
    """torch ``grid_sample`` 3D, bilinear+border+align_corners=True
    (reference ``resfields.py:320-336`` feat_sample3d).

    vol: [C, D, H, W]; coords: [N, 3] in [-1, 1] ordered (x, y, z) =
    (W, H, D) index — torch's grid coordinate convention. Returns [N, C].
    """
    _, D, H, W = vol.shape

    def to_ix(c, size):
        return jnp.clip((c + 1.0) * 0.5 * (size - 1), 0.0, size - 1.0)

    x = to_ix(coords[:, 0], W)
    y = to_ix(coords[:, 1], H)
    z = to_ix(coords[:, 2], D)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    fx, fy, fz = x - x0, y - y0, z - z0

    flat = vol.reshape(vol.shape[0], -1)  # [C, D*H*W]

    def take(zi, yi, xi):
        return flat[:, (zi * H + yi) * W + xi].T  # [N, C]

    c000 = take(z0, y0, x0); c001 = take(z0, y0, x1)  # noqa: E702
    c010 = take(z0, y1, x0); c011 = take(z0, y1, x1)  # noqa: E702
    c100 = take(z1, y0, x0); c101 = take(z1, y0, x1)  # noqa: E702
    c110 = take(z1, y1, x0); c111 = take(z1, y1, x1)  # noqa: E702
    fx, fy, fz = fx[:, None], fy[:, None], fz[:, None]
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


class _NGPHead(nn.Module):
    """HashGrid + 1-hidden-layer 64-wide ReLU MLP standing in for a
    tinycudann NetworkWithInputEncoding (reference ``resfields.py:96-124``:
    16 levels x 2 feats, 2^18 table, base 16, scale 1.5, FullyFusedMLP 64)."""
    out_features: int

    @nn.compact
    def __call__(self, pts01):
        from splatfields_tpu.models.encoders import HashGridEncoder
        feat = HashGridEncoder(
            n_levels=16, n_features=2, base_resolution=16,
            per_level_scale=1.5, log2_hashmap_size=18)(pts01)
        h = nn.relu(nn.Dense(64, kernel_init=torch_linear_weight,
                             bias_init=torch_linear_bias(feat.shape[-1]))(feat))
        return nn.Dense(self.out_features, kernel_init=torch_linear_weight,
                        bias_init=torch_linear_bias(64))(h)


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
    chunk_size: Optional[int] = None
    chunk_strategy: str = "both"
    ignore_residuals: bool = False
    lock_weights: bool = False

    def setup(self):
        if self.compression not in _SUPPORTED:
            raise NotImplementedError(
                f"compression '{self.compression}' is not a reference zoo "
                "member (see /root/reference/utils/resfields.py:40)")
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
        if self.compression == "vm" and self.chunk_size is not None:
            # chunked vm (reference resfields.py:61-74): capacity frames
            # grouped into capacity//chunk_size chunks, each with its own
            # shared base delta and/or its own matrix_t
            if self.chunk_strategy not in ("shared", "delta", "both"):
                raise ValueError(self.chunk_strategy)
            n_chunks = self.capacity // self.chunk_size
            if n_chunks <= 1:
                raise ValueError(
                    "chunk_size should be smaller than capacity "
                    "(reference resfields.py:66)")
            if n_chunks * self.chunk_size != self.capacity:
                # upstream's arange(n_chunks).repeat_interleave(chunk_size)
                # under-covers a non-divisible capacity and late frames
                # index out of bounds — make the contract explicit
                raise ValueError(
                    f"capacity {self.capacity} must be divisible by "
                    f"chunk_size {self.chunk_size}")
            self.weights_t = self.param(
                "weights_t", normal_scaled(0.01), (n_coefs, self.rank))
            if self.chunk_strategy in ("shared", "both"):
                # upstream copies 0.01*base-weight per chunk; independent
                # same-distribution draw here (module docstring)
                self.chunk_weights = self.param(
                    "chunk_weights",
                    lambda k, s: 0.01 * torch_linear_weight(
                        k, (s[2], s[1])).T[None].repeat(s[0], axis=0),
                    (n_chunks, self.out_features, self.in_features))
            if self.chunk_strategy in ("delta", "both"):
                # all chunks start from ONE shared draw (upstream
                # repeat()s a single matrix_t, resfields.py:72)
                self.matrix_t = self.param(
                    "matrix_t",
                    lambda k, s: jnp.broadcast_to(
                        normal_scaled(0.01)(k, s[1:]), s),
                    (n_chunks, self.rank, numel))
            else:
                self.matrix_t = self.param(
                    "matrix_t", normal_scaled(0.01), (self.rank, numel))
        elif self.compression in ("vm", "vm_cum", "vm_cum_mat"):
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
        elif self.compression == "vm_attention":
            # reference resfields.py:135-144: learned frame-frame attention
            # smooths the coefficient rows before the vm contraction
            self.attention_weight = self.param(
                "attention_weight",
                lambda k, s, d=jnp.float32: jnp.ones(s, d),
                (n_coefs, self.rank))
            if self.fuse_mode == "mul":
                w_init = lambda k, s, d=jnp.float32: jnp.full(s, 1.0 / self.rank, d)
                m_init = lambda k, s, d=jnp.float32: jnp.ones(s, d)
            else:
                w_init = normal_scaled(0.01)
                m_init = normal_scaled(0.01)
            self.weights_t = self.param("weights_t", w_init, (n_coefs, self.rank))
            self.matrix_t = self.param("matrix_t", m_init, (self.rank, numel))
        elif self.compression == "loe":
            # mixture-of-experts lookup: rank expert weight matrices,
            # nearest-expert by time (reference resfields.py:133-134,258-266)
            self.matrix_t = self.param(
                "matrix_t", lambda k, s, d=jnp.float32: jnp.zeros(s, d),
                (self.rank, numel))
        elif self.compression == "mm_tensor":
            self.weights_t = self.param(
                "weights_t", normal_scaled(0.01),
                (n_coefs, self.out_features, self.rank))
            self.matrix_t = self.param(
                "matrix_t", normal_scaled(0.01), (self.rank, self.in_features))
        elif self.compression == "vm_noweight":
            self.matrix_t = self.param(
                "matrix_t", normal_scaled(1e-6), (self.rank, numel))
        elif self.compression in ("none", "none_cum"):
            self.matrix_t = self.param(
                "matrix_t", lambda k, s, d=jnp.float32: jnp.zeros(s, d),
                (self.capacity, numel))
        elif self.compression == "resnet":
            # dead upstream: registered but the forward routes to the plain
            # linear (reference resfields.py:150-151,391-392)
            self.resnet_vec = self.param(
                "resnet_vec", lambda k, s, d=jnp.float32: jnp.zeros(s, d),
                (self.capacity, self.out_features))
        elif self.compression == "cp":
            # CP factors of the [capacity, out, in] delta stack (reference
            # resfields.py:302-307; values are 0.01 normals, see docstring)
            self.lin_w = self.param("lin_w", normal_scaled(0.01), (self.rank,))
            self.lin_f1 = self.param(
                "lin_f1", normal_scaled(0.01), (self.capacity, self.rank))
            self.lin_f2 = self.param(
                "lin_f2", normal_scaled(0.01), (self.out_features, self.rank))
            self.lin_f3 = self.param(
                "lin_f3", normal_scaled(0.01), (self.in_features, self.rank))
        elif self.compression == "tucker":
            r0 = min(self.rank, self.capacity)
            r1 = min(self.rank, self.out_features)
            r2 = min(self.rank, self.in_features)
            self.tucker_core = self.param(
                "tucker_core", normal_scaled(0.01), (r0, r1, r2))
            self.tucker_f0 = self.param(
                "tucker_f0", normal_scaled(0.01), (self.capacity, r0))
            self.tucker_f1 = self.param(
                "tucker_f1", normal_scaled(0.01), (self.out_features, r1))
            self.tucker_f2 = self.param(
                "tucker_f2", normal_scaled(0.01), (self.in_features, r2))
        elif self.compression == "lora_3":
            # coordinate-conditioned low-rank weights sampled from a dense
            # [capacity^3] grid (reference resfields.py:126-130,345-364)
            n_ch = (self.out_features + self.in_features) * self.rank
            self.weights_t = self.param(
                "weights_t", normal_scaled(0.01),
                (1, n_ch, self.capacity, self.capacity, self.capacity))
        elif self.compression == "lora_ngp":
            self.ngp_coef = _NGPHead(self.in_features)
            self.ngp_bases = _NGPHead(self.out_features)

    def _fuse(self, delta, base_flat):
        if self.fuse_mode == "add":
            return delta + base_flat
        if self.fuse_mode == "mul":
            return delta * base_flat
        return delta  # 'none'

    def _base(self):
        """Base weight [in, out]; detached when lock_weights (reference
        ``_get_weight``, resfields.py:373-376)."""
        return jax.lax.stop_gradient(self.weight) if self.lock_weights \
            else self.weight

    def _oi_to_io(self, flat_oi):
        """(out, in)-flattened vector -> [in, out] weight."""
        return flat_oi.reshape(self.out_features, self.in_features).T

    def _fuse_oi(self, delta_oi_flat):
        """Fuse a torch-layout (out*in) delta with the base, -> [in, out]."""
        base_oi_flat = self._base().T.reshape(-1)
        return self._oi_to_io(self._fuse(delta_oi_flat, base_oi_flat))

    def _delta_weight(self, input_time=None, frame_id=None) -> jnp.ndarray:
        """Effective [F_in, F_out] weight for one frame (or [N, F_in, F_out]
        for interpolation modes with per-sample time)."""
        base = self._base()  # [in, out]
        base_flat = base.reshape(-1)  # row-major (in, out)

        if self.compression == "vm" and self.chunk_size is not None:
            if frame_id is None:
                raise NotImplementedError(
                    "chunked vm supports lookup mode only (frame_id "
                    "required); interpolation over chunk boundaries is "
                    "undefined upstream too (reference resfields.py:181-219 "
                    "indexes weights_t/chunks by integer frame_id)")
            wt = self.weights_t[frame_id]                    # [R]
            ch = frame_id // self.chunk_size
            if self.chunk_strategy == "shared":
                mat = jnp.matmul(wt, self.matrix_t, precision="highest")
                base_oi = self.chunk_weights[ch] + base.T    # [out, in]
            elif self.chunk_strategy == "delta":
                mat = jnp.matmul(wt, self.matrix_t[ch], precision="highest")
                base_oi = base.T
            else:  # both
                mat = jnp.matmul(wt, self.matrix_t[ch], precision="highest")
                base_oi = self.chunk_weights[ch] + base.T
            return self._oi_to_io(self._fuse(mat, base_oi.reshape(-1)))

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
                return self._fuse_oi(delta_oi)
            delta = delta_oi.reshape(-1, self.out_features, self.in_features)
            delta = jnp.swapaxes(delta, -1, -2)  # [N, in, out]
            return self._fuse(delta.reshape(delta.shape[0], -1),
                              base_flat[None]).reshape(
                -1, self.in_features, self.out_features)
        if self.compression == "vm_attention":
            # softmax over dim 0 = over frames, per column (reference :280)
            a = self.attention_weight
            attn = jax.nn.softmax(
                jnp.matmul(a, a.T, precision="highest") / self.rank, axis=0)
            wt = jnp.matmul(attn, self.weights_t, precision="highest")[frame_id]
            return self._fuse_oi(
                jnp.matmul(wt, self.matrix_t, precision="highest"))
        if self.compression == "vm_cum_mat":
            # selu(W_t M) cumulatively summed over frames; one masked
            # matvec extracts the frame row without the [C, numel] cumsum
            m = jax.nn.selu(jnp.matmul(
                self.weights_t, self.matrix_t, precision="highest"))  # [C,numel]
            mask = (jnp.arange(m.shape[0]) <= frame_id).astype(m.dtype)
            return self._fuse_oi(
                jnp.matmul(mask, m, precision="highest"))
        if self.compression == "loe":
            if input_time is None:
                raise NotImplementedError(
                    "compression='loe' requires input_time (nearest-expert "
                    "lookup); upstream crashes on input_time=None too "
                    "(reference resfields.py:259)")
            if self.mode == "lookup":
                raise NotImplementedError(
                    "compression='loe' supports the interpolation modes "
                    "only: upstream's lookup path indexes the PER-SAMPLE "
                    "weight stack by frame_id (reference resfields.py:"
                    "293-300 'mat[frame_id]' where mat's axis 0 is the "
                    "sample axis, not frames) — semantically broken; we "
                    "refuse instead of reproducing it")
            # nearest expert: grid_sample 'nearest' + border + align_corners
            t = (input_time.reshape(-1) + 1.0) / 2.0 * (self.rank - 1)
            r = jnp.clip(jnp.round(t), 0, self.rank - 1).astype(jnp.int32)
            delta_oi = self.matrix_t[r]  # [N, numel]; no fuse (reference :258)
            delta = delta_oi.reshape(-1, self.out_features, self.in_features)
            return jnp.swapaxes(delta, -1, -2)  # [N, in, out]
        if self.compression == "mm_tensor":
            mat = jnp.matmul(self.weights_t[frame_id], self.matrix_t,
                             precision="highest")  # [out, in]
            return self._fuse_oi(mat.reshape(-1))
        if self.compression == "cp":
            w = self.lin_w * self.lin_f1[frame_id]  # [R]
            mat = jnp.einsum("r,or,ir->oi", w, self.lin_f2, self.lin_f3,
                             precision="highest")
            return self._fuse_oi(mat.reshape(-1))
        if self.compression == "tucker":
            g = jnp.einsum("abc,a->bc", self.tucker_core,
                           self.tucker_f0[frame_id], precision="highest")
            mat = jnp.einsum("bc,ob,ic->oi", g, self.tucker_f1,
                             self.tucker_f2, precision="highest")
            return self._fuse_oi(mat.reshape(-1))
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
            return self._oi_to_io(delta_oi)
        if self.compression == "none":
            return self._fuse_oi(self.matrix_t[frame_id])
        if self.compression == "none_cum":
            # cumulative deltas scaled by 1/250 with the base as frame 0
            # (reference :276-279)
            mat = jnp.asarray(self.matrix_t) / 250.0  # [C, out*in]
            mat = mat.at[0].set(0.0)
            cum = jnp.cumsum(mat, axis=0)[frame_id]
            base_oi_flat = base.T.reshape(-1)
            return self._oi_to_io(base_oi_flat + cum)
        raise AssertionError

    def _query_lora(self, x, coords):
        """Coordinate-conditioned low-rank path (reference ``query_lora``,
        resfields.py:337-371): shared linear + per-point rank-R bottleneck.

        x: [N, F_in]; coords: [N, 3] in [-1, 1]. Returns [N, F_out].
        """
        if self.compression == "lora_3":
            w = _trilinear_sample_border(self.weights_t[0], coords)
            r, fo, fi = self.rank, self.out_features, self.in_features
            w_out = w[:, :r * fo].reshape(-1, r, fo)      # [N, R, out]
            w_in = w[:, r * fo:].reshape(-1, r, fi)       # [N, R, in]
            xr = jnp.einsum("nri,ni->nr", w_in, x, precision="highest")
            out = jnp.einsum("nro,nr->no", w_out, xr, precision="highest")
        else:  # lora_ngp
            pts01 = coords * 0.5 + 0.5
            coeff = self.ngp_coef(pts01)                  # [N, in]
            bases = self.ngp_bases(pts01)                 # [N, out]
            out = jnp.sum(x * coeff, axis=-1, keepdims=True) * bases
        shared = jnp.matmul(x, self.weight) + self.bias
        return shared + out

    def __call__(self, x: jnp.ndarray, input_time=None,
                 frame_id: Optional[jnp.ndarray] = None,
                 coordinates: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        plain = (self.ignore_residuals or not self.active
                 or self.compression == "resnet")
        if not plain and self.compression.startswith("lora"):
            if coordinates is None:
                raise ValueError(
                    "coordinates must be provided for lora compressions "
                    "(reference resfields.py:394)")
            return self._query_lora(x, coordinates)
        if plain or (frame_id is None and input_time is None):
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
