"""Per-Gaussian preprocessing for the tile rasterizer (pure JAX, differentiable).

Re-implements, TPU-first, the preprocess stage of the pinned CUDA rasterizer
(``ingra14m/depth-diff-gaussian-rasterization``, documented via its call
contract at reference ``gaussian_renderer/__init__.py:59-102``):

- world -> view -> clip transforms (row-vector convention: matrices are
  stored transposed like the reference's ``world_view_transform`` /
  ``full_proj_transform``, reference ``scene/cameras.py:68-73``),
- frustum culling at view z <= 0.2,
- 3D covariance from (scale, quaternion),
- EWA projection to 2D conics with the 0.3-pixel dilation,
- screen radius from the max eigenvalue (3 sigma),
- optional SH -> clamped RGB evaluation against the camera position.

Everything is N-parallel elementwise/3x3 math: one fused XLA kernel on the
VPU, fully differentiable (autodiff supplies the backward used for training
and for the densification screen-space gradient statistics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from splatfields_tpu.ops.sh import sh_to_rgb_clamped
from splatfields_tpu.utils.transforms import build_covariance


class PreprocessOut(NamedTuple):
    means2d: jnp.ndarray   # [N, 2] pixel-space centers
    depths: jnp.ndarray    # [N] view-space z
    conics: jnp.ndarray    # [N, 3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray     # [N] int32 screen radius (0 = culled)
    rgb: jnp.ndarray       # [N, 3] per-splat color
    opacity: jnp.ndarray   # [N]
    visible: jnp.ndarray   # [N] bool


def _ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """CUDA ndc2Pix: ((v + 1) * S - 1) * 0.5."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means3d: jnp.ndarray,          # [N, 3]
    scales: jnp.ndarray,           # [N, 3] activated (positive) scales
    rotations: jnp.ndarray,        # [N, 4] quaternions (w, x, y, z)
    opacities: jnp.ndarray,        # [N] or [N, 1] in [0, 1]
    viewmatrix: jnp.ndarray,       # [4, 4] transposed W2V (p_view = p_h @ M)
    projmatrix: jnp.ndarray,       # [4, 4] transposed full view*proj
    image_width: int,
    image_height: int,
    tanfovx: float,
    tanfovy: float,
    colors_precomp: jnp.ndarray | None = None,   # [N, 3]
    shs: jnp.ndarray | None = None,              # [N, K, 3]
    sh_degree: int = 0,
    campos: jnp.ndarray | None = None,           # [3]
    scale_modifier: float = 1.0,
    valid_mask: jnp.ndarray | None = None,       # [N] bool (padded capacity)
) -> PreprocessOut:
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    opacities = opacities.reshape(-1).astype(f32)
    n = means3d.shape[0]

    focal_x = image_width / (2.0 * tanfovx)
    focal_y = image_height / (2.0 * tanfovy)

    ones = jnp.ones((n, 1), f32)
    p_hom_in = jnp.concatenate([means3d, ones], axis=-1)
    p_view = jnp.matmul(p_hom_in, viewmatrix.astype(f32), precision="highest")[:, :3]
    p_clip = jnp.matmul(p_hom_in, projmatrix.astype(f32), precision="highest")
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_ndc = p_clip[:, :3] * p_w[:, None]

    in_frustum = p_view[:, 2] > 0.2

    # --- 3D covariance ---
    cov3d = build_covariance(scales.astype(f32) * scale_modifier, rotations.astype(f32))

    # --- EWA projection (CUDA computeCov2D) ---
    tz = p_view[:, 2]
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    # Jacobian J (2x3) of the perspective projection at the clamped point
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z * inv_z

    # cov2d = A cov3d A^T with A = J @ R_w2v. viewmatrix is stored
    # transposed (p_view_row = p_row @ Wm), so R_w2v[k, c] = Wm[c, k] and
    # (J @ R_w2v)[i, c] = sum_k J[i, k] * Wm[c, k] — i.e. columns of Wm.
    # Unrolled elementwise (batched 3x3 einsums hit the slow tiny-matmul
    # path on TPU).
    Wm = viewmatrix[:3, :3].astype(f32)
    A0 = j00[:, None] * Wm[None, :, 0] + j02[:, None] * Wm[None, :, 2]  # [N, 3]
    A1 = j11[:, None] * Wm[None, :, 1] + j12[:, None] * Wm[None, :, 2]  # [N, 3]

    # B_r = cov3d @ A_r^T computed per component: B_r[:, k] = sum_j S[k,j] A_r[:, j]
    def quad(a, b):
        # a^T cov3d b for row vectors a, b: sum_{k,j} a_k S_kj b_j
        return (
            a[:, 0] * (cov3d[:, 0, 0] * b[:, 0] + cov3d[:, 0, 1] * b[:, 1]
                       + cov3d[:, 0, 2] * b[:, 2])
            + a[:, 1] * (cov3d[:, 1, 0] * b[:, 0] + cov3d[:, 1, 1] * b[:, 1]
                         + cov3d[:, 1, 2] * b[:, 2])
            + a[:, 2] * (cov3d[:, 2, 0] * b[:, 0] + cov3d[:, 2, 1] * b[:, 1]
                         + cov3d[:, 2, 2] * b[:, 2])
        )

    cxx = quad(A0, A0) + 0.3
    cyy = quad(A1, A1) + 0.3
    cxy = quad(A0, A1)

    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    means2d = jnp.stack(
        [_ndc2pix(p_ndc[:, 0], image_width), _ndc2pix(p_ndc[:, 1], image_height)],
        axis=-1,
    )

    visible = in_frustum & det_ok
    if valid_mask is not None:
        visible = visible & valid_mask
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)

    # --- color ---
    if colors_precomp is not None:
        rgb = colors_precomp.astype(f32)
    else:
        assert shs is not None and campos is not None
        dirs = means3d - campos[None, :].astype(f32)
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        # sh layout [N, K, 3] -> channel-major [N, 3, K] for eval_sh
        rgb = sh_to_rgb_clamped(sh_degree, jnp.swapaxes(shs.astype(f32), -1, -2), dirs)

    return PreprocessOut(
        means2d=means2d,
        depths=p_view[:, 2],
        conics=conic,
        radii=radii,
        rgb=rgb,
        opacity=opacities,
        visible=visible,
    )
