"""Explicit splat parameter store: padded pytree + densification + Adam.

TPU-native redesign of the reference ``scene/gaussian_model.py``:

- Parameters live in fixed-*capacity* arrays with a validity mask, so every
  training step is shape-stable under jit. Densify / clone / split / prune
  become one masked compaction (gather into fresh arrays) instead of the
  reference's Python-side tensor and Adam-state surgery
  (``scene/gaussian_model.py:257-332``). The host grows capacity (and
  re-jits) only when occupancy crosses a threshold.
- The optimizer is a hand-rolled per-leaf Adam matching torch.optim.Adam
  semantics with eps=1e-15 (reference ``training_setup``,
  ``scene/gaussian_model.py:123-143``): denom = sqrt(v_hat) + eps; per-group
  learning rates injected per step (xyz follows the exponential schedule,
  reference ``update_learning_rate`` ``:145-151``). Keeping Adam explicit
  makes densification state surgery a pure tree-gather.

Parity map (reference scene/gaussian_model.py):
- activations exp/log scaling, sigmoid opacity, normalize rotation (:33-68)
- isotropic mode stores 1 scale, broadcast on read (:64-68,106-109)
- create_from_pcd: SH DC from RGB, scale = log sqrt(mean sq dist of 3 NN)
  via the KNN op, opacity init 0.1 (:95-121)
- densify_and_clone (:394-409), densify_and_split (:355-380) with
  N=2 children sampled from the Gaussian and scale/1.6,
  densify_and_prune thresholds (:411-425),
  add_densification_stats (:427-438) incl. the subsample-idx path
- reset_opacity (:207-210) — kept though train.py never calls it
- PLY save/load layout (:153-255), byte-compatible
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.ops.knn import mean_sq_dist_knn3
from splatfields_tpu.ops.sh import rgb_to_sh
from splatfields_tpu.utils.transforms import inverse_sigmoid, quat_to_rotmat


# ---------------------------------------------------------------------------
# parameter pytree
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplatParams:
    """Raw (pre-activation) splat parameters at fixed capacity C."""
    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] or [C, 1] (isotropic) — log space
    rotation: jnp.ndarray       # [C, 4]
    opacity: jnp.ndarray        # [C, 1] — logit space

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplatStats:
    """Densification bookkeeping (reference :42-49,125-126)."""
    valid: jnp.ndarray              # [C] bool
    max_radii2d: jnp.ndarray        # [C] float32
    xyz_gradient_accum: jnp.ndarray  # [C] float32
    denom: jnp.ndarray              # [C] float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    count: jnp.ndarray  # scalar int32
    mu: Any             # like params
    nu: Any             # like params


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def get_scaling(p: SplatParams) -> jnp.ndarray:
    s = jnp.exp(p.scaling)
    if s.shape[-1] == 1:
        s = jnp.repeat(s, 3, axis=-1)
    return s


def get_opacity(p: SplatParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_rotation(p: SplatParams) -> jnp.ndarray:
    return p.rotation / (jnp.linalg.norm(p.rotation, axis=-1, keepdims=True) + 1e-12)


def get_features(p: SplatParams) -> jnp.ndarray:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def create_from_pcd(points: np.ndarray, colors: np.ndarray, sh_degree: int,
                    capacity: int | None = None,
                    isotropic: bool = False) -> tuple[SplatParams, SplatStats]:
    """Initialize splats from a point cloud (reference ``create_from_pcd``,
    ``scene/gaussian_model.py:95-121``). Pads to ``capacity``."""
    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n
    k = (sh_degree + 1) ** 2

    dist2 = np.asarray(mean_sq_dist_knn3(jnp.asarray(points.astype(np.float32))))
    scale_init = np.log(np.sqrt(dist2))[:, None]
    scaling = scale_init if isotropic else np.repeat(scale_init, 3, axis=1)

    fused_color = np.asarray(rgb_to_sh(jnp.asarray(colors.astype(np.float32))))
    features_dc = fused_color[:, None, :]                      # [N, 1, 3]
    features_rest = np.zeros((n, k - 1, 3), np.float32)

    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.1))), np.float32)

    def pad(a):
        out = np.zeros((capacity,) + a.shape[1:], a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    params = SplatParams(
        xyz=pad(points.astype(np.float32)),
        features_dc=pad(features_dc),
        features_rest=pad(features_rest),
        scaling=pad(scaling.astype(np.float32)),
        rotation=pad(rotation),
        opacity=pad(opacity),
    )
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    stats = SplatStats(
        valid=jnp.asarray(valid),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, stats


# ---------------------------------------------------------------------------
# Adam (torch semantics, eps after sqrt)
# ---------------------------------------------------------------------------

def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, params))


def adam_update(params: Any, grads: Any, state: AdamState, lrs: Any,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-15) -> tuple[Any, AdamState]:
    """One Adam step. ``lrs`` is a pytree of scalars matching ``params``
    structure (or a single scalar). torch.optim.Adam parity: bias-corrected
    moments, denom = sqrt(v_hat) + eps."""
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    if not isinstance(lrs, type(params)) and not isinstance(lrs, dict):
        lrs = jax.tree.map(lambda _: lrs, params)

    def upd(p, m, v, lr):
        return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lrs)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def splat_lr_tree(position_lr: float, feature_lr: float, opacity_lr: float,
                  scaling_lr: float, rotation_lr: float,
                  spatial_lr_scale: float = 5.0) -> SplatParams:
    """Per-group LRs (reference ``training_setup``: xyz scaled by
    spatial_lr_scale=5, f_rest at feature_lr/20)."""
    return SplatParams(
        xyz=position_lr * spatial_lr_scale,
        features_dc=feature_lr,
        features_rest=feature_lr / 20.0,
        scaling=scaling_lr,
        rotation=rotation_lr,
        opacity=opacity_lr,
    )


# ---------------------------------------------------------------------------
# densification
# ---------------------------------------------------------------------------

def add_densification_stats(stats: SplatStats, screen_grad: jnp.ndarray,
                            radii: jnp.ndarray,
                            idx: jnp.ndarray | None = None) -> SplatStats:
    """Accumulate ||dL/dmeans2D|| for visible splats (reference :427-438).

    Args:
        screen_grad: [N, 2] gradient of the loss w.r.t. the screenspace
            offset (NDC half-resolution units, see raster.api).
        radii: [N] screen radii from the render (visibility = radii > 0).
        idx: optional [N] subsample indices into the capacity arrays (the
            ``n_splats`` path, reference ``train.py:56-62``); None = identity.
    """
    norm = jnp.linalg.norm(screen_grad, axis=-1)
    vis = radii > 0
    add_accum = jnp.where(vis, norm, 0.0)
    add_denom = vis.astype(jnp.float32)
    if idx is None:
        return dataclasses.replace(
            stats,
            xyz_gradient_accum=stats.xyz_gradient_accum + add_accum,
            denom=stats.denom + add_denom,
        )
    return dataclasses.replace(
        stats,
        xyz_gradient_accum=stats.xyz_gradient_accum.at[idx].add(add_accum),
        denom=stats.denom.at[idx].add(add_denom),
    )


def update_max_radii(stats: SplatStats, radii: jnp.ndarray,
                     idx: jnp.ndarray | None = None) -> SplatStats:
    """max_radii2D tracking (reference ``train.py:280-286``)."""
    r = radii.astype(jnp.float32)
    if idx is None:
        new = jnp.where(radii > 0, jnp.maximum(stats.max_radii2d, r),
                        stats.max_radii2d)
    else:
        cur = stats.max_radii2d[idx]
        upd = jnp.where(radii > 0, jnp.maximum(cur, r), cur)
        new = stats.max_radii2d.at[idx].set(upd)
    return dataclasses.replace(stats, max_radii2d=new)


@functools.partial(jax.jit, static_argnames=("percent_dense", "n_split", "max_screen_size"))
def densify_and_prune(
    params: SplatParams,
    stats: SplatStats,
    opt_state: AdamState,
    rng: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,   # 0 = disabled (size_threshold None)
    percent_dense: float = 0.01,
    n_split: int = 2,
) -> tuple[SplatParams, SplatStats, AdamState, jnp.ndarray]:
    """One densification round: clone + split + prune + compaction.

    Returns (params, stats, opt_state, n_dropped) where n_dropped counts new
    splats that did not fit in capacity (host should grow & re-jit if > 0).

    Semantics per reference ``densify_and_prune`` (:411-425):
    - grads = accum / denom (0 where denom == 0)
    - clone: grad >= thr and max scale <= percent_dense * extent
    - split: grad >= thr and max scale >  percent_dense * extent;
      2 children sampled from N(0, scale) rotated into world, scale /= 1.6;
      parent removed
    - prune: opacity < min_opacity, or (if max_screen_size > 0)
      scale > 0.1 * extent. NOTE the reference's ``max_radii2D >
      max_screen_size`` test is a no-op: ``densification_postfix`` (run by
      clone AND split, :352-354) zeroes max_radii2D for every point before
      ``densify_and_prune`` reads it (:421), so the screen-size prune never
      fires there — we reproduce the EFFECTIVE behavior and do not test
      max_radii2d. ``max_screen_size`` still gates the world-size prune.
    - all stats reset to zero afterwards (densification_postfix)
    """
    cap = params.capacity
    valid = stats.valid
    grads = jnp.where(stats.denom > 0, stats.xyz_gradient_accum / stats.denom, 0.0)

    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=-1)
    opacity = get_opacity(params)[:, 0]

    high_grad = (grads >= grad_threshold) & valid
    small = max_scale <= percent_dense * extent
    want_clone = high_grad & small
    want_split = high_grad & ~small

    prune = (opacity < min_opacity)
    if max_screen_size:
        prune = prune | (max_scale > 0.1 * extent)
    prune = prune & valid

    # children inherit the prune test (post-split opacity/scale prune);
    # child scale = parent/1.6, radii2d = 0 so only opacity/scale matter
    child_scale_max = max_scale / (0.8 * n_split)
    child_prune = opacity < min_opacity
    if max_screen_size:
        child_prune = child_prune | (child_scale_max > 0.1 * extent)
    # clones likewise re-tested (same values as parent)
    clone_prune = prune

    survive = valid & ~prune & ~want_split
    make_clone = want_clone & ~clone_prune & ~want_split
    make_child = want_split & ~child_prune

    n_surv = jnp.sum(survive.astype(jnp.int32))
    n_clone = jnp.sum(make_clone.astype(jnp.int32))
    n_child = jnp.sum(make_child.astype(jnp.int32)) * n_split
    total = n_surv + n_clone + n_child
    n_dropped = jnp.maximum(0, total - cap)

    # destination slots
    surv_pos = jnp.cumsum(survive.astype(jnp.int32)) - 1
    clone_pos = n_surv + jnp.cumsum(make_clone.astype(jnp.int32)) - 1
    child_base = n_surv + n_clone
    child_pos0 = child_base + n_split * (jnp.cumsum(make_child.astype(jnp.int32)) - 1)

    src = jnp.arange(cap, dtype=jnp.int32)
    gather_idx = jnp.zeros((cap + 1,), jnp.int32)
    is_child_slot = jnp.zeros((cap + 1,), bool)
    child_rank = jnp.zeros((cap + 1,), jnp.int32)

    def scat(buf, pos, val, mask):
        return buf.at[jnp.where(mask, pos, cap)].set(val, mode="drop")

    gather_idx = scat(gather_idx, surv_pos, src, survive & (surv_pos < cap))
    gather_idx = scat(gather_idx, clone_pos, src, make_clone & (clone_pos < cap))
    for j in range(n_split):
        posj = child_pos0 + j
        m = make_child & (posj < cap)
        gather_idx = scat(gather_idx, posj, src, m)
        is_child_slot = scat(is_child_slot, posj, jnp.ones(cap, bool), m)
        child_rank = scat(child_rank, posj, jnp.full(cap, j, jnp.int32), m)
    gather_idx = gather_idx[:cap]
    is_child_slot = is_child_slot[:cap]
    child_rank = child_rank[:cap]

    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    new_valid = slot_ids < jnp.minimum(total, cap)
    is_new_slot = slot_ids >= n_surv  # clones and children: fresh Adam state

    def take(a):
        return a[gather_idx]

    new_params = jax.tree.map(take, params)

    # split-child transform: xyz += R @ (noise * scale); scaling -= log(1.6)
    noise = jax.random.normal(rng, (cap, n_split, 3), jnp.float32)
    child_noise = jnp.take_along_axis(
        noise[gather_idx], child_rank[:, None, None], axis=1)[:, 0]
    parent_scale = get_scaling(new_params)
    parent_rot = quat_to_rotmat(get_rotation(new_params))
    offset = jnp.einsum("nij,nj->ni", parent_rot, child_noise * parent_scale,
                        precision="highest")
    child_xyz = new_params.xyz + offset
    child_scaling = new_params.scaling - jnp.log(0.8 * n_split)

    new_params = dataclasses.replace(
        new_params,
        xyz=jnp.where(is_child_slot[:, None], child_xyz, new_params.xyz),
        scaling=jnp.where(is_child_slot[:, None], child_scaling,
                          new_params.scaling),
    )
    # zero out padding slots so downstream code sees benign values
    new_params = jax.tree.map(
        lambda a: jnp.where(
            new_valid.reshape((-1,) + (1,) * (a.ndim - 1)), a,
            jnp.zeros_like(a)),
        new_params,
    )

    # optimizer state: survivors keep, new slots zeroed (reference Adam
    # surgery appends zeros :257-332)
    def surgery(m):
        g = m[gather_idx]
        keep = (~is_new_slot) & new_valid
        return jnp.where(keep.reshape((-1,) + (1,) * (g.ndim - 1)), g,
                         jnp.zeros_like(g))

    new_opt = AdamState(
        count=opt_state.count,
        mu=jax.tree.map(surgery, opt_state.mu),
        nu=jax.tree.map(surgery, opt_state.nu),
    )

    new_stats = SplatStats(
        valid=new_valid,
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    return new_params, new_stats, new_opt, n_dropped


def reset_opacity(params: SplatParams, opt_state: AdamState
                  ) -> tuple[SplatParams, AdamState]:
    """opacity <- min(opacity, 0.01) with optimizer-state reset for the
    opacity leaf (reference :207-210 + replace_tensor_to_optimizer; unused
    by train.py but part of the API surface)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    new_params = dataclasses.replace(params, opacity=new_op)
    mu = dataclasses.replace(opt_state.mu, opacity=jnp.zeros_like(new_op))
    nu = dataclasses.replace(opt_state.nu, opacity=jnp.zeros_like(new_op))
    return new_params, AdamState(count=opt_state.count, mu=mu, nu=nu)


# ---------------------------------------------------------------------------
# PLY IO (host side, byte-compatible with the reference layout)
# ---------------------------------------------------------------------------

def construct_list_of_attributes(params: SplatParams) -> list[str]:
    """Attribute names as the reference writes them (:153-165)."""
    attrs = ["x", "y", "z", "nx", "ny", "nz"]
    attrs += [f"f_dc_{i}" for i in range(params.features_dc.shape[1] * 3)]
    attrs += [f"f_rest_{i}" for i in range(params.features_rest.shape[1] * 3)]
    attrs += ["opacity"]
    attrs += [f"scale_{i}" for i in range(params.scaling.shape[1])]
    attrs += [f"rot_{i}" for i in range(params.rotation.shape[1])]
    return attrs


def save_ply(path: str, params: SplatParams, valid: np.ndarray,
             overwrite: dict | None = None, vis_geometric: bool = False):
    """Binary-little-endian PLY, reference layout (:167-205).

    ``overwrite`` mirrors the reference's ``overwrite_attributes``: field-
    predicted xyz/f_dc/f_rest/opacity/scaling/rotation baked into the file
    (``train.py:86-99``). ``vis_geometric`` writes random colors and
    opacity 1 for geometry visualization.
    """
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    v = np.asarray(valid)
    xyz = np.asarray(params.xyz)[v]
    n = xyz.shape[0]
    f_dc = np.asarray(params.features_dc)[v]
    f_rest = np.asarray(params.features_rest)[v]
    opacity = np.asarray(params.opacity)[v]
    scaling = np.asarray(params.scaling)[v]
    rotation = np.asarray(params.rotation)[v]

    if overwrite:
        def o(key, cur):
            val = overwrite.get(key)
            return np.asarray(val) if val is not None else cur
        xyz = o("xyz", xyz)
        f_dc = o("f_dc", f_dc)
        f_rest = o("f_rest", f_rest)
        if "opacity" in overwrite:  # activated -> logit space like reference
            ov = np.clip(np.asarray(overwrite["opacity"]), 1e-6, 1 - 1e-6)
            opacity = np.log(ov / (1 - ov))
        if "scaling" in overwrite:  # activated delta -> log space
            scaling = np.log(np.clip(np.asarray(overwrite["scaling"]), 1e-10, None))
        rotation = o("rotation", rotation)
        n = xyz.shape[0]
    if vis_geometric:
        rng = np.random.RandomState(0)
        f_dc = np.asarray(rgb_to_sh(jnp.asarray(rng.rand(n, 1, 3).astype(np.float32))))
        f_rest = np.zeros_like(f_rest[:n])
        opacity = np.full((n, 1), 15.0, np.float32)  # sigmoid ~ 1

    # torch layout: features transposed to [N, 3, K] then flattened
    f_dc_flat = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    f_rest_flat = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)
    normals = np.zeros_like(xyz)

    attrs = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc_flat.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest_flat.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scaling.shape[1])]
             + [f"rot_{i}" for i in range(rotation.shape[1])])
    dtype = np.dtype([(a, "<f4") for a in attrs])
    data = np.concatenate(
        [xyz, normals, f_dc_flat, f_rest_flat, opacity, scaling, rotation], 1
    ).astype(np.float32)
    rec = np.empty(n, dtype=dtype)
    for i, a in enumerate(attrs):
        rec[a] = data[:, i]

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {a}\n" for a in attrs)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


def load_ply(path: str, capacity: int | None = None,
             isotropic: bool = False) -> tuple[SplatParams, SplatStats, int]:
    """Load a reference-layout splat PLY (:212-255). Returns params, stats
    and the max SH degree inferrable from the f_rest count."""
    from splatfields_tpu.data.ply import read_ply_vertices
    names, data = read_ply_vertices(path)
    col = {nm: data[:, i] for i, nm in enumerate(names)}
    n = data.shape[0]
    xyz = np.stack([col["x"], col["y"], col["z"]], -1)
    opacity = col["opacity"][:, None]
    f_dc = np.stack([col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]], -1)[:, None, :]
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]))
    n_rest = len(rest_names)
    if n_rest:
        rest = np.stack([col[nm] for nm in rest_names], -1)  # [N, 3*(K-1)]
        rest = rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    scale_names = sorted((nm for nm in names if nm.startswith("scale_")),
                         key=lambda s: int(s.split("_")[-1]))
    scaling = np.stack([col[nm] for nm in scale_names], -1)
    if isotropic and scaling.shape[1] == 3:
        scaling = scaling[:, :1]
    rot_names = sorted((nm for nm in names if nm.startswith("rot_")),
                       key=lambda s: int(s.split("_")[-1]))
    rotation = np.stack([col[nm] for nm in rot_names], -1)

    capacity = capacity or n
    sh_degree = int(np.sqrt(n_rest // 3 + 1)) - 1

    def pad(a):
        out = np.zeros((capacity,) + a.shape[1:], np.float32)
        out[:n] = a
        return jnp.asarray(out)

    params = SplatParams(
        xyz=pad(xyz), features_dc=pad(f_dc), features_rest=pad(rest),
        scaling=pad(scaling), rotation=pad(rotation), opacity=pad(opacity))
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    stats = SplatStats(
        valid=jnp.asarray(valid),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, stats, sh_degree
