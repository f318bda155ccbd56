"""Time-conditioned VAE-style CNN decoder (flax, NHWC).

The generative plane decoder of SplatFields — the paper's CNN spatial-bias
prior. Parity target: reference ``scene/time_decoders.py`` (TimeVAEDecoder,
built from diffusers-0.21.4 blocks):

- conv_in 3x3 -> mid block (resnet, single-head spatial attention, resnet)
  -> ``len(block_out_channels)`` up blocks of (layers_per_block + 1) resnets
  with a nearest-2x + conv3x3 upsample on all but the final block ->
  GroupNorm/SiLU/conv_out (``TimeDecoder.forward``, :528-580).
- Resnet block: GN(eps 1e-6) -> SiLU -> conv1 -> GN -> SiLU -> conv2, with a
  1x1 shortcut when channels change (``TimeResnetBlock2D``, :53-250);
  temb is never used in this decoder (temb_channels=None).
- Temporal conditioning: with ``strategy='per_frame'`` every 3x3 conv keeps
  per-frame weight deltas initialized to 0.01 x the shared kernel and adds
  the selected frame's delta at lookup (``TimeLoRACompatibleConv``, :21-50).
- Init: kaiming-normal(fan_out) convs, GroupNorm ones/zeros, zero-init on
  every resnet conv2 and on the attention output projection
  (``TimeVAEDecoder.init_weights``, :611-625).

Note: with 4 up blocks the final block has no upsampler, so the spatial
upsampling factor is 8 (20x20 noise -> 160x160 planes). The reference's
"320" comments (``scene/tripFields.py:203``) are stale — its own decoder
also upsamples 8x for this config.

TPU notes: convs run in NHWC (XLA's preferred layout) and the 20x20
mid-block attention is one small fused matmul pair. The whole decoder is
N-independent — it runs once per training step regardless of splat count
(SURVEY hard-part 5).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.models.initializers import (
    kaiming_normal_conv,
    normal_scaled,
    torch_linear_bias,
    torch_linear_weight,
    zeros_init,
)


def _grouped_linear(key, shape, dtype=jnp.float32):
    """[groups, in, out] block-diagonal linear; torch default per block."""
    fan_in = shape[1]
    k = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -k, k)


def _kaiming_grouped(groups):
    """kaiming_normal_conv with per-group fan_out (each group is an
    independent conv of out//groups features)."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out = shape
        std = np.sqrt(2.0 / (kh * kw * (out // groups)))
        return std * jax.random.normal(key, shape, dtype)
    return init


class TimeConv(nn.Module):
    """3x3 (or 1x1) conv with optional per-frame weight deltas.

    ``groups > 1`` is the block-diagonal channel-pack lowering
    (feature_group_count): N independent per-plane convs become ONE conv
    over N*C lanes — identical math, fewer/wider MXU passes."""
    features: int
    kernel: int = 3
    n_frames: int = 0
    strategy: str = "none"   # 'none' | 'per_frame'
    zero_init: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x, frame_id=None):
        in_ch = x.shape[-1]
        kinit = (zeros_init if self.zero_init
                 else (_kaiming_grouped(self.groups) if self.groups > 1
                       else kaiming_normal_conv))
        kernel = self.param(
            "kernel", kinit,
            (self.kernel, self.kernel, in_ch // self.groups, self.features))
        bias = self.param("bias", zeros_init, (self.features,))
        # bf16 conv inputs (SPLATFIELDS_CNN_BF16): f32 convs lower to
        # multi-pass bf16 on the MXU, so casting inputs+kernel to bf16
        # with f32 accumulation trades invisible precision for pass count.
        # Output, bias and GroupNorm stay f32. Quality-gate before use.
        import os
        bf16 = os.environ.get("SPLATFIELDS_CNN_BF16", "off") == "on"
        if self.strategy == "per_frame" and self.n_frames > 1:
            # init = 0.01 * shared kernel, replicated per frame (reference
            # time_decoders.py:30-32). Implemented as an init-time transform
            # of the already-initialized shared kernel is not expressible in
            # flax param init, so initialize with the same distribution
            # scaled by 0.01 — statistically identical for kaiming-normal.
            scale = 0.0 if self.zero_init else 0.01
            fw_init = (zeros_init if self.zero_init
                       else normal_scaled(scale * float(np.sqrt(
                           2.0 / (self.kernel * self.kernel
                                  * (self.features // self.groups))))))
            frame_w = self.param(
                "frame_weights", fw_init,
                (self.n_frames, self.kernel, self.kernel,
                 in_ch // self.groups, self.features))
            if frame_id is not None:
                kernel = kernel + frame_w[frame_id]
        pad = self.kernel // 2
        if bf16:
            # bf16 conv output (upcast after): a f32 preferred_element_type
            # would hand the conv transpose an f32 cotangent against bf16
            # operands, which lax.conv rejects; the MXU still accumulates
            # f32 internally
            x = x.astype(jnp.bfloat16)
            kernel = kernel.astype(jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return out.astype(jnp.float32) + bias


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    n_frames: int = 0
    strategy: str = "none"
    conv_groups: int = 1   # channel-pack feature_group_count

    @nn.compact
    def __call__(self, x, frame_id=None):
        in_ch = x.shape[-1]
        cg = self.conv_groups
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm1")(x)
        h = jax.nn.silu(h)
        h = TimeConv(self.out_channels, 3, self.n_frames, self.strategy,
                     groups=cg, name="conv1")(h, frame_id)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm2")(h)
        h = jax.nn.silu(h)
        h = TimeConv(self.out_channels, 3, self.n_frames, self.strategy,
                     zero_init=True, groups=cg, name="conv2")(h, frame_id)
        if in_ch != self.out_channels:
            x = TimeConv(self.out_channels, 1, self.n_frames, self.strategy,
                         groups=cg, name="conv_shortcut")(x, frame_id)
        return x + h


class SpatialAttention(nn.Module):
    """Single-head spatial self-attention over H*W tokens (diffusers
    ``Attention`` in deprecated-attn-block mode: GN -> qkv -> softmax(f32)
    -> zero-init out -> +residual)."""
    channels: int
    groups: int = 32
    eps: float = 1e-6

    n_packs: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        hstates = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                               name="group_norm")(x)
        if self.n_packs > 1:
            # block-diagonal (per-pack) projections + per-pack attention:
            # one batched matmul per projection instead of n_packs small
            # Denses; math identical to the unpacked per-plane module.
            g, cgr = self.n_packs, c // self.n_packs
            tokens = hstates.reshape(b, h * w, g, cgr)

            def glin(name, zero=False):
                kin = zeros_init if zero else _grouped_linear
                wgt = self.param(f"{name}_kernel", kin, (g, cgr, cgr))
                bia = self.param(
                    f"{name}_bias",
                    zeros_init if zero else torch_linear_bias(cgr), (g, cgr))
                return wgt, bia

            def apply(tok, name, zero=False):
                wgt, bia = glin(name, zero)
                return jnp.einsum("bqgc,gcd->bqgd", tok, wgt,
                                  precision="highest") + bia

            q = apply(tokens, "to_q")
            k = apply(tokens, "to_k")
            v = apply(tokens, "to_v")
            scale = 1.0 / jnp.sqrt(jnp.asarray(cgr, jnp.float32))
            attn = jnp.einsum("bqgc,bkgc->bgqk", q, k,
                              precision="highest") * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(x.dtype)
            out = jnp.einsum("bgqk,bkgc->bqgc", attn, v, precision="highest")
            out = apply(out, "to_out", zero=True)
            return res + out.reshape(b, h, w, c)
        tokens = hstates.reshape(b, h * w, c)
        q = nn.Dense(c, kernel_init=torch_linear_weight,
                     bias_init=torch_linear_bias(c), name="to_q")(tokens)
        k = nn.Dense(c, kernel_init=torch_linear_weight,
                     bias_init=torch_linear_bias(c), name="to_k")(tokens)
        v = nn.Dense(c, kernel_init=torch_linear_weight,
                     bias_init=torch_linear_bias(c), name="to_v")(tokens)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        attn = jnp.einsum("bqc,bkc->bqk", q, k, precision="highest") * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, precision="highest")
        out = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                       name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class Upsample2x(nn.Module):
    """Nearest-neighbor 2x + conv3x3 (diffusers Upsample2D use_conv=True)."""
    features: int
    n_frames: int = 0
    strategy: str = "none"
    conv_groups: int = 1

    @nn.compact
    def __call__(self, x, frame_id=None):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return TimeConv(self.features, 3, self.n_frames, self.strategy,
                        groups=self.conv_groups, name="conv")(x, frame_id)


class TimeVAEDecoder(nn.Module):
    """Noise [B, h, w, in_ch] -> planes [B, 8h, 8w, out_ch].

    ``n_packs > 1`` runs N independent decoders as ONE channel-packed
    decoder (all convs grouped via feature_group_count, GroupNorm group
    count scaled, block-diagonal attention): per-pack math is identical to
    n_packs separate modules, but every conv runs n_packs x wider MXU
    lanes (32 -> 96 at the bench config). Channel sizes here are PER PACK;
    input is [B, h, w, n_packs*in_ch] pack-major, output likewise."""
    in_channels: int = 8
    out_channels: int = 16
    block_out_channels: Sequence[int] = (32, 32, 32, 32)
    layers_per_block: int = 1
    norm_num_groups: int = 32
    n_frames: int = 0
    strategy: str = "none"
    n_packs: int = 1

    @nn.compact
    def __call__(self, z, frame_id=None):
        p = self.n_packs
        tc = dict(n_frames=self.n_frames, strategy=self.strategy)
        rc = dict(tc, conv_groups=p)
        gn = self.norm_num_groups * p
        ch_last = self.block_out_channels[-1] * p
        x = TimeConv(ch_last, 3, groups=p, name="conv_in", **tc)(z, frame_id)

        # mid block: resnet -> attention -> resnet
        x = ResnetBlock(ch_last, gn, name="mid_res0", **rc)(x, frame_id)
        x = SpatialAttention(ch_last, gn, n_packs=p, name="mid_attn")(x)
        x = ResnetBlock(ch_last, gn, name="mid_res1", **rc)(x, frame_id)

        rev = list(reversed(self.block_out_channels))
        n_blocks = len(self.block_out_channels)
        for i in range(n_blocks):
            out_ch = rev[i] * p
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock(out_ch, gn,
                                name=f"up{i}_res{j}", **rc)(x, frame_id)
            if i != n_blocks - 1:
                x = Upsample2x(out_ch, conv_groups=p,
                               name=f"up{i}_upsample", **tc)(x, frame_id)

        x = nn.GroupNorm(num_groups=gn, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = TimeConv(self.out_channels * p, 3, groups=p,
                     name="conv_out", **tc)(x, frame_id)
        return x


class VAEDecoder(TimeVAEDecoder):
    """Static (non-time-conditioned) decoder alias — reference
    ``scene/decoders.py:332-369``: identical architecture with
    strategy='none' (the reference keeps a separate copy; here it is the
    n_frames=0 configuration of the same module)."""

    def __call__(self, z, frame_id=None):
        return super().__call__(z, None)


class Conv1DStack(nn.Module):
    """Decoder1D (reference ``scene/tripFields.py:206-273``): conv ->
    [conv+GroupNorm+SiLU -> linear upsample]* -> conv -> SiLU, NLC layout."""
    in_channels: int = 8
    out_channels: int = 16
    upsample_resolutions: Sequence[int] = (32, 64, 64, 128, 128, 256, 256)
    block_channels: Sequence[int] = (128, 128, 128, 128, 64, 64, 32, 32)

    @nn.compact
    def __call__(self, x):  # [B, L, C]
        def conv1d(h, feats, name):
            k = self.param(f"{name}_kernel", kaiming_normal_conv,
                           (3, 1, h.shape[-1], feats))[:, 0]
            return jax.lax.conv_general_dilated(
                h, k, (1,), [(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"))

        x = conv1d(x, self.block_channels[0], "conv_in")
        for i, res in enumerate(self.upsample_resolutions):
            x = conv1d(x, self.block_channels[i + 1], f"conv_{i}")
            x = nn.GroupNorm(num_groups=16, name=f"norm_{i}")(x)
            x = jax.nn.silu(x)
            # linear interpolation to target length (align_corners=False)
            b, l, c = x.shape
            pos = (jnp.arange(res) + 0.5) * l / res - 0.5
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, l - 1)
            hi = jnp.clip(lo + 1, 0, l - 1)
            f = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
            x = x[:, lo] * (1 - f) + x[:, hi] * f
        x = conv1d(x, self.out_channels, "conv_out")
        return jax.nn.silu(x)


class Conv3DStack(nn.Module):
    """Decoder3D (reference ``scene/tripFields.py:295-361``): 3-D conv
    stack with nearest upsampling, NDHWC layout."""
    in_channels: int = 8
    out_channels: int = 16
    upsample_resolutions: Sequence[int] = (4, 4, 8, 16, 32)
    block_channels: Sequence[int] = (128, 128, 128, 64, 32, 32)

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        def conv3d(h, feats, name):
            k = self.param(f"{name}_kernel", _kaiming3d, (3, 3, 3,
                                                          h.shape[-1], feats))
            return jax.lax.conv_general_dilated(
                h, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        x = conv3d(x, self.block_channels[0], "conv_in")
        for i, res in enumerate(self.upsample_resolutions):
            x = conv3d(x, self.block_channels[i + 1], f"conv_{i}")
            x = nn.GroupNorm(num_groups=16, name=f"norm_{i}")(x)
            x = jax.nn.silu(x)
            b, d, h, w, c = x.shape
            if res != d:
                rep = res // d
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, rep, 1), rep, 2),
                               rep, 3)
        x = conv3d(x, self.out_channels, "conv_out")
        return jax.nn.silu(x)


def _kaiming3d(key, shape, dtype=jnp.float32):
    kd, kh, kw, _, out = shape
    std = float(np.sqrt(2.0 / (kd * kh * kw * out)))
    return std * jax.random.normal(key, shape, dtype)


class Tensorial1D(nn.Module):
    """Frozen-noise 1-D feature-line generator (reference :275-293)."""
    noise_ch: int = 8
    out_ch: int = 16
    noise_res: int = 8

    @nn.compact
    def __call__(self):
        noise = self.variable(
            "buffers", "noise",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (1, self.noise_res, self.noise_ch)))
        r = self.noise_res
        net = Conv1DStack(
            self.noise_ch, self.out_ch,
            tuple(r * i for i in (2, 4, 8, 16, 16)),
            (128, 128, 128, 64, 32, 32), name="net")
        return net(noise.value)  # [1, 16r, out_ch]


class Tensorial3D(nn.Module):
    """Frozen-noise 3-D feature-grid generator (reference :363-381)."""
    noise_ch: int = 8
    out_ch: int = 16
    noise_res: int = 4

    @nn.compact
    def __call__(self):
        noise = self.variable(
            "buffers", "noise",
            lambda: jax.random.normal(
                self.make_rng("params"),
                (1, self.noise_res, self.noise_res, self.noise_res,
                 self.noise_ch)))
        r = self.noise_res
        net = Conv3DStack(
            self.noise_ch, self.out_ch,
            tuple(r * i for i in (1, 1, 2, 4, 8)),
            (128, 128, 128, 64, 32, 32), name="net")
        return net(noise.value)  # [1, 8r, 8r, 8r, out_ch]


class Tensorial2D(nn.Module):
    """Frozen-noise plane generator (reference ``scene/tripFields.py:176-204``):
    a fixed N(0,1) [noise_res, noise_res, noise_ch] buffer decoded by
    TimeVAEDecoder into a feature plane every forward."""
    noise_ch: int = 8
    out_ch: int = 16
    noise_res: int = 20
    n_frames: int = 0
    strategy: str = "none"
    n_packs: int = 1   # channel-pack: n_packs independent planes in one net

    @nn.compact
    def __call__(self, frame_id=None):
        noise = self.variable(
            "buffers", "noise",
            lambda: jax.random.normal(
                self.make_rng("params"),
                (1, self.noise_res, self.noise_res,
                 self.n_packs * self.noise_ch)),
        )
        net = TimeVAEDecoder(
            in_channels=self.noise_ch, out_channels=self.out_ch,
            n_frames=self.n_frames, strategy=self.strategy,
            n_packs=self.n_packs, name="net")
        return net(noise.value, frame_id)  # [1, 8r, 8r, n_packs*out_ch]
