"""The SplatFields network: encoder + six MLP heads (flax).

Parity target: reference ``utils/time_utils.py:306-508`` (``SplatFields``).
Given N input points (and a time step for 4-D), predicts per-splat
attributes:

- ``mlp_deform`` -> canonical offset, scaled by ``deform_weight``
  (``xyz_can = xyz_in + w * delta``, :480-483; w=0 for front-facing DTU)
- ``mlp_scale`` / ``mlp_opacity`` / ``mlp_rotation`` on (xyz_can, features)
  — or on features alone with ``geo_model_disable_pts`` (:379-381,486-488)
- ``mlp_rgb`` (sigmoid) or view-dependent variant emitting a feature that a
  final Linear+sigmoid combines with the view direction (:360-376,493-498)
- ``mlp_flow`` + ``FlowHead`` for n_frames > 0 (:420-437,500-505)

Encoder: ``encoder_type='VarTriPlaneEncoder'`` instantiates the generated
tri-planes + a 2-layer ReLU feature refiner (:314-336); any other value
means feat_dim = 0 (pure-MLP ablation). Time embedding: 3-octave positional
encoding of scalar t when n_frames > 0 (:339-343).

TPU structure note: ``__call__`` accepts precomputed ``planes`` so the
N-independent CNN decode can run once per step and be reused across
subsampled splat batches / microbatches (SURVEY hard-part 5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from splatfields_tpu.models.encoders import (
    GridEncoder,
    HexPlaneEncoder,
    NGPMLP,
    TriPlaneEncoder,
    VarHexPlaneEncoder,
    VarTriPlaneEncoder,
)
from splatfields_tpu.models.flow import FlowHead
from splatfields_tpu.models.initializers import (
    torch_linear_bias,
    torch_linear_weight,
)
from splatfields_tpu.models.mlp import GeneralMLP, positional_embed

_ENCODERS = {
    "VarTriPlaneEncoder": VarTriPlaneEncoder,
    "VarHexPlaneEncoder": VarHexPlaneEncoder,
    "TriPlaneEncoder": TriPlaneEncoder,
    "HexPlaneEncoder": HexPlaneEncoder,
    "GridEncoder": GridEncoder,
    "NGPMLP": NGPMLP,
}


class SplatFields(nn.Module):
    """kwargs mirror the reference's ModelHiddenParams surface."""
    n_frames: int = 0
    radius: float | None = None
    encoder_type: str = ""
    # dict or tuple-of-pairs (the latter keeps the module hashable for
    # jit-static usage)
    encoder_args: Any = None
    layer_strategy: str = "none"
    composition_rank: int = 0
    deform_weight: float = 1.0
    use_view_dep_rgb: bool = False
    geo_model_disable_pts: bool = False
    time_multires: int = 3
    deform_w: int = 128
    deform_d: int = 6
    deform_skips: tuple = (3,)
    deform_multires: int = 6
    rgb_w: int = 128
    rgb_d: int = 6
    rgb_skips: tuple = (3,)
    rgb_multires: int = 6
    scale_w: int = 64
    scale_d: int = 4
    scale_skips: tuple = (2,)
    scale_multires: int = 4
    opacity_w: int = 64
    opacity_d: int = 4
    opacity_skips: tuple = (2,)
    opacity_multires: int = 3
    rotation_w: int = 64
    rotation_d: int = 3
    rotation_skips: tuple = (20,)
    rotation_multires: int = 3
    # optionally run equal-width rank-0 heads as one batched einsum per
    # depth level (bit-identical math; see mlp.fused_mlp_heads). Measured
    # neutral on v5e at 100k splats — XLA already schedules the small
    # sequential matmuls well — so the default stays off.
    fuse_heads: bool = False
    # fully-fused Pallas head kernel (ops/fused_mlp.py): activations stay
    # in VMEM across the whole head stack instead of round-tripping HBM
    # per layer. In ISOLATION it beats the flax path 2x (5.5 vs 11.1 ms
    # fwd+bwd at 100k pts, blk 2048 fwd / 1024 bwd), but inside the full
    # train step it REGRESSES the bench 52->89 ms: the custom-call
    # boundary breaks XLA's fusion of the embedding/loss graph around the
    # heads, and the forced materializations cost more than the kernel
    # saves (bench A/B 2026-08-17). 'auto' therefore = OFF;
    # SPLATFIELDS_FUSED_MLP=on forces it for experiments.
    fused_pallas: str = "auto"
    fused_block: int = 2048
    flow_w: int = 128
    flow_d: int = 6
    flow_skips: tuple = (3,)
    flow_multires: int = 6
    flow_model: str = "se3"
    dct_basis: int = 4
    contract_ngp: bool = False
    log2_hashmap_size: int = 20
    n_levels: int = 16

    def setup(self):
        args = dict(self.encoder_args) if self.encoder_args else {}
        if self.encoder_type in _ENCODERS:
            cls = _ENCODERS[self.encoder_type]
            if self.encoder_type in ("VarTriPlaneEncoder", "VarHexPlaneEncoder"):
                args.setdefault("n_frames", self.n_frames)
                args.setdefault("strategy", self.layer_strategy)
            if self.encoder_type == "NGPMLP":
                args.setdefault("radius", self.radius or 1.0)
                args.setdefault("contract", self.contract_ngp)
                args.setdefault("log2_hashmap_size", self.log2_hashmap_size)
                args.setdefault("n_levels", self.n_levels)
            self.encoder = cls(**args, name="encoder")
            self.feat_dim = self.encoder.out_dim
            self.refine0 = nn.Dense(
                self.feat_dim, kernel_init=torch_linear_weight,
                bias_init=torch_linear_bias(self.feat_dim), name="refine0")
            self.refine1 = nn.Dense(
                self.feat_dim, kernel_init=torch_linear_weight,
                bias_init=torch_linear_bias(self.feat_dim), name="refine1")
        else:
            self.encoder = None
            self.feat_dim = 0

        self.time_input_ch = (
            1 + 2 * self.time_multires if self.n_frames > 0 else 0)

        in_feat = 3 + self.feat_dim + self.time_input_ch
        rank = self.composition_rank
        nf = self.n_frames
        self.mlp_deform = GeneralMLP(
            in_features=in_feat, out_features=3,
            hidden_features=self.deform_w, num_hidden_layers=self.deform_d,
            skips=self.deform_skips, multires=self.deform_multires,
            out_activation="none", act="leaky_relu",
            composition_rank=rank, n_frames=nf, name="mlp_deform")
        self.mlp_rgb = GeneralMLP(
            in_features=in_feat,
            out_features=self.rgb_w if self.use_view_dep_rgb else 3,
            hidden_features=self.rgb_w, num_hidden_layers=self.rgb_d,
            skips=self.rgb_skips, multires=self.rgb_multires,
            out_activation="none" if self.use_view_dep_rgb else "sigmoid",
            act="leaky_relu", composition_rank=rank, n_frames=nf,
            name="mlp_rgb")
        if self.use_view_dep_rgb:
            self.rgb_viewdep = nn.Dense(
                3, kernel_init=torch_linear_weight,
                bias_init=torch_linear_bias(3 + self.rgb_w),
                name="rgb_viewdep")

        geo_in = in_feat - (3 if self.geo_model_disable_pts else 0)
        geo_mr = (lambda mr: 0 if self.geo_model_disable_pts else mr)
        self.mlp_scale = GeneralMLP(
            in_features=geo_in, out_features=3,
            hidden_features=self.scale_w, num_hidden_layers=self.scale_d,
            skips=self.scale_skips, multires=geo_mr(self.scale_multires),
            out_activation="none", act="leaky_relu",
            composition_rank=rank, n_frames=nf, name="mlp_scale")
        self.mlp_opacity = GeneralMLP(
            in_features=geo_in, out_features=1,
            hidden_features=self.opacity_w, num_hidden_layers=self.opacity_d,
            skips=self.opacity_skips, multires=geo_mr(self.opacity_multires),
            out_activation="sigmoid", act="leaky_relu",
            composition_rank=rank, n_frames=nf, name="mlp_opacity")
        self.mlp_rotation = GeneralMLP(
            in_features=geo_in, out_features=4,
            hidden_features=self.rotation_w,
            num_hidden_layers=self.rotation_d,
            skips=self.rotation_skips, multires=geo_mr(self.rotation_multires),
            out_activation="normalize", act="leaky_relu",
            composition_rank=rank, n_frames=nf, name="mlp_rotation")
        if nf > 0:
            self.mlp_flow = GeneralMLP(
                in_features=in_feat, out_features=self.flow_w,
                hidden_features=self.flow_w, num_hidden_layers=self.flow_d,
                skips=self.flow_skips, multires=self.flow_multires,
                out_activation="none", act="leaky_relu",
                composition_rank=rank, n_frames=nf, name="mlp_flow")
            self.flow_head = FlowHead(
                width=self.flow_w, flow_model=self.flow_model,
                num_basis=self.dct_basis, n_frames=nf, name="mlp_flow_head")

    def generate_planes(self, frame_id=None):
        """Run only the N-independent plane CNNs (VarTriPlane/VarHex)."""
        assert self.encoder is not None and hasattr(self.encoder, "planes")
        return self.encoder.planes(frame_id)

    def extract_features(self, x, t, frame_id=None, planes=None):
        t_feat = None
        if self.n_frames > 0:
            t_feat = positional_embed(t, self.time_multires)
        x_feat = None
        if self.feat_dim > 0:
            if planes is not None:
                x_feat = self.encoder(x, input_time=t, frame_id=frame_id,
                                      planes=planes)
            else:
                x_feat = self.encoder(x, input_time=t, frame_id=frame_id)
            x_feat = self.refine1(nn.relu(self.refine0(x_feat)))
        if t_feat is not None and x_feat is not None:
            return jnp.concatenate([x_feat, t_feat], axis=-1)
        return t_feat if t_feat is not None else x_feat

    def __call__(self, xyz_in: jnp.ndarray, t: Optional[jnp.ndarray] = None,
                 planes: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """xyz_in [N, 3]; t [N, 1] (same value per row) for 4-D scenes."""
        time_step = None
        frame_id = None
        if self.n_frames > 0:
            time_step = jnp.reshape(t, (-1,))[0]
            frame_id = jnp.round(time_step * (self.n_frames - 1)).astype(jnp.int32)

        pts_feat = self.extract_features(xyz_in, t, frame_id, planes)

        if self._fused_pallas_active():
            return self._call_fused(xyz_in, pts_feat)

        if self.deform_weight > 0:
            delta = self.mlp_deform(xyz=xyz_in, xyz_feat=pts_feat,
                                    frame_id=frame_id)
            xyz_can = xyz_in + self.deform_weight * delta
        else:
            xyz_can = xyz_in

        geo_xyz, geo_feat = xyz_can, pts_feat
        if self.geo_model_disable_pts:
            geo_xyz, geo_feat = pts_feat, None

        # one shared sin/cos sweep of xyz_can at the max multires of all
        # consuming heads; each head slices its prefix (same math, ~5x
        # fewer transcendentals per step)
        can_emb = None
        if not self.geo_model_disable_pts:
            from splatfields_tpu.models.mlp import positional_embed as _pe
            max_mr = max(self.rgb_multires, self.scale_multires,
                         self.opacity_multires, self.rotation_multires,
                         self.flow_multires if self.n_frames > 0 else 0)
            can_emb = _pe(xyz_can, max_mr)

        # ResField ranks are active only when composition_rank > 0 AND
        # n_frames > 0 (GeneralMLP's cap guard); only rank-0 heads fuse.
        from splatfields_tpu.models.mlp import embed_dim, fused_mlp_heads
        from splatfields_tpu.models.resfields import _out_act
        fuse_ok = (self.fuse_heads and not self.is_initializing()
                   and (self.composition_rank == 0 or self.n_frames <= 0))

        def head_in(mr, xyz_h, feat_h):
            """Replicates GeneralMLP's embedded-input construction."""
            if mr > 0:
                hi = (can_emb[:, : embed_dim(mr, 3)] if can_emb is not None
                      else positional_embed(xyz_h, mr))
            else:
                hi = xyz_h
            return hi if feat_h is None else jnp.concatenate(
                [hi, feat_h], axis=-1)

        out: Dict[str, Any] = {}
        gmr = (lambda mr: 0 if self.geo_model_disable_pts else mr)
        if fuse_ok and self.scale_w == self.opacity_w == self.rotation_w:
            p = self.variables["params"]
            o_sc, o_op, o_ro = fused_mlp_heads(
                [p["mlp_scale"], p["mlp_opacity"], p["mlp_rotation"]],
                [self.scale_skips, self.opacity_skips, self.rotation_skips],
                [head_in(gmr(self.scale_multires), geo_xyz, geo_feat),
                 head_in(gmr(self.opacity_multires), geo_xyz, geo_feat),
                 head_in(gmr(self.rotation_multires), geo_xyz, geo_feat)])
            out["scales"] = o_sc
            out["opacity"] = jax.nn.sigmoid(o_op)
            out["rotations"] = _out_act("normalize")(o_ro)
        else:
            out["scales"] = self.mlp_scale(xyz=geo_xyz, xyz_feat=geo_feat,
                                           frame_id=frame_id,
                                           xyz_embedded=can_emb)
            out["opacity"] = self.mlp_opacity(xyz=geo_xyz, xyz_feat=geo_feat,
                                              frame_id=frame_id,
                                              xyz_embedded=can_emb)
            out["rotations"] = self.mlp_rotation(
                xyz=geo_xyz, xyz_feat=geo_feat, frame_id=frame_id,
                xyz_embedded=can_emb)

        hidden = None
        if (fuse_ok and self.n_frames > 0 and self.rgb_w == self.flow_w):
            p = self.variables["params"]
            o_rgb, hidden = fused_mlp_heads(
                [p["mlp_rgb"], p["mlp_flow"]],
                [self.rgb_skips, self.flow_skips],
                [head_in(self.rgb_multires, xyz_can, pts_feat),
                 head_in(self.flow_multires, xyz_can, pts_feat)])
            rgb = o_rgb if self.use_view_dep_rgb else jax.nn.sigmoid(o_rgb)
        else:
            rgb = self.mlp_rgb(xyz=xyz_can, xyz_feat=pts_feat,
                               frame_id=frame_id, xyz_embedded=can_emb)
            if self.n_frames > 0:
                hidden = self.mlp_flow(xyz=xyz_can, xyz_feat=pts_feat,
                                       frame_id=frame_id,
                                       xyz_embedded=can_emb)
        if self.use_view_dep_rgb:
            if self.is_initializing():
                # materialize the view-dependent head's params (it is only
                # invoked later, with per-splat view dirs, via
                # ``rgb_from_viewdir``)
                self.rgb_viewdep(jnp.zeros((1, self.rgb_w + 3)))
            out["rgb_feat"] = rgb  # combine with viewdirs via rgb_from_viewdir
        else:
            out["rgb"] = rgb

        if self.n_frames > 0:
            flow, means3d = self.flow_head(
                hidden=hidden, pts=xyz_can, time_step=time_step,
                frame_id=frame_id)
        else:
            flow, means3d = None, xyz_can

        out["flow"] = flow
        out["means3D"] = means3d
        return out

    def _fused_pallas_active(self) -> bool:
        """The fully-fused Pallas head path covers the static (3-D) rank-0
        point-conditioned configuration — exactly the released Blender/DTU
        protocols. 4-D (flow head), geo_model_disable_pts and active
        ResField ranks fall back to the flax path."""
        import os
        mode = os.environ.get("SPLATFIELDS_FUSED_MLP", self.fused_pallas)
        if mode == "off" or self.is_initializing():
            return False
        ok = (self.n_frames <= 0 and not self.geo_model_disable_pts)
        if not ok:
            return False
        if mode == "on":
            return True
        return False  # 'auto' = off: step-level fusion-break regression

    def _call_fused(self, xyz_in: jnp.ndarray,
                    pts_feat: Optional[jnp.ndarray]) -> Dict[str, Any]:
        from splatfields_tpu.ops.fused_mlp import (
            fused_heads, pack_params, plan_from_module)
        interpret = jax.default_backend() == "cpu"
        cdt = jnp.float32 if interpret else jnp.bfloat16
        params = self.variables["params"]
        feat = (pts_feat if self.feat_dim > 0
                else jnp.zeros((xyz_in.shape[0], 0), jnp.float32))

        if self.deform_weight > 0:
            plan_a = plan_from_module(self, "deform")
            wa, ba = pack_params(params, plan_a)
            emb_d = positional_embed(xyz_in, self.deform_multires)
            (delta,) = fused_heads(plan_a, self.fused_block, cdt, interpret,
                                   emb_d, feat, wa, ba)
            xyz_can = xyz_in + self.deform_weight * delta
        else:
            xyz_can = xyz_in

        plan_b = plan_from_module(self, "downstream")
        wb, bb = pack_params(params, plan_b)
        max_mr = max(self.rgb_multires, self.scale_multires,
                     self.opacity_multires, self.rotation_multires)
        emb_c = positional_embed(xyz_can, max_mr)
        rgb_pre, sc, op, ro = fused_heads(
            plan_b, self.fused_block, cdt, interpret, emb_c, feat, wb, bb)

        from splatfields_tpu.models.resfields import _out_act
        out: Dict[str, Any] = {
            "scales": sc,
            "opacity": jax.nn.sigmoid(op),
            "rotations": _out_act("normalize")(ro),
            "flow": None,
            "means3D": xyz_can,
        }
        if self.use_view_dep_rgb:
            out["rgb_feat"] = rgb_pre
        else:
            out["rgb"] = jax.nn.sigmoid(rgb_pre)
        return out

    def rgb_from_viewdir(self, rgb_feat: jnp.ndarray,
                         viewdirs: jnp.ndarray) -> jnp.ndarray:
        """View-dependent color head: sigmoid(Linear([feat, dir])) —
        reference's ``rgb_fnc`` closure, consumed with per-splat view dirs
        at ``gaussian_renderer/__init__.py:43-46``."""
        x = jnp.concatenate([rgb_feat, viewdirs], axis=-1)
        return nn.sigmoid(self.rgb_viewdep(x))
