"""Rotation / covariance / SE(3) math for splats, in pure JAX.

Parity targets:
- quaternion -> rotation matrix and scaling-rotation factor:
  reference ``utils/general_utils.py:138-171``.
- covariance lower-triangular packing: reference
  ``scene/gaussian_model.py:53-61``.
- SO(3)/SE(3) exponential maps: reference ``utils/rigid_utils.py``.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized-quaternion (w, x, y, z) -> rotation matrix.

    Accepts unnormalized quaternions; normalizes first (reference
    ``utils/general_utils.py:122-135`` ``build_rotation``).

    Args:
        q: [..., 4] quaternions in (r, x, y, z) order.
    Returns:
        [..., 3, 3] rotation matrices.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w,x,y,z) quaternions (reference
    ``gaussian_renderer/__init__.py:18-27``)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): the Gaussian's affine factor (reference
    ``utils/general_utils.py:162-171``)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Full 3x3 covariance Sigma = L L^T with L = R diag(s).

    Unrolled elementwise (full f32; batched 3x3 matmuls both hit TPU's slow
    tiny-matmul path and its bf16 default precision).
    """
    L = build_scaling_rotation(scales, quats)

    def sig(i, j):
        return (L[..., i, 0] * L[..., j, 0] + L[..., i, 1] * L[..., j, 1]
                + L[..., i, 2] * L[..., j, 2])

    row0 = jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2)], -1)
    row1 = jnp.stack([sig(0, 1), sig(1, 1), sig(1, 2)], -1)
    row2 = jnp.stack([sig(0, 2), sig(1, 2), sig(2, 2)], -1)
    return jnp.stack([row0, row1, row2], -2)


def covariance_lowertri(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Covariance packed as the 6 upper-triangular entries (xx, xy, xz, yy,
    yz, zz) — the rasterizer's ``cov3D_precomp`` layout (reference
    ``utils/general_utils.py:33-37`` ``strip_lowerdiag``)."""
    S = build_covariance(scales, quats)
    return jnp.stack(
        [S[..., 0, 0], S[..., 0, 1], S[..., 0, 2], S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]],
        -1,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """logit (reference ``utils/general_utils.py:28``)."""
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# SO(3) / SE(3) exponential maps (reference utils/rigid_utils.py)
# ---------------------------------------------------------------------------

def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis vector -> [..., 3, 3] cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis [..., 3], angle [..., 1] -> [..., 3, 3]."""
    W = skew(w)
    W_sqr = jnp.matmul(W, W, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    th = theta[..., None]
    return eye + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * W_sqr


def _rp_to_se3(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    bottom = jnp.zeros_like(R[..., :1, :])
    bottom = jnp.concatenate([bottom, jnp.ones_like(p[..., :1, :])], -1)
    top = jnp.concatenate([R, p], -1)
    return jnp.concatenate([top, bottom], -2)


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Screw-axis exponential (Modern Robotics Eqn 3.88).

    Args:
        S: [..., 6] screw axis (w, v).
        theta: [..., 1] magnitude.
    Returns:
        [..., 4, 4] homogeneous transforms.
    """
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    W_sqr = jnp.matmul(W, W, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    th = theta[..., None]
    G = th * eye + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W_sqr
    p = jnp.matmul(G, v[..., None], precision="highest")
    return _rp_to_se3(R, p)


def scaled_exp_se3(S: jnp.ndarray, theta: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """exp_se3 with the rotation block scaled (reference
    ``utils/rigid_utils.py:85-110``)."""
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    W_sqr = jnp.matmul(W, W, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    th = theta[..., None]
    G = th * eye + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W_sqr
    p = jnp.matmul(G, v[..., None], precision="highest")
    return _rp_to_se3(scale[..., None] * R, p)


def to_homogeneous(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], -1)


def from_homogeneous(v: jnp.ndarray) -> jnp.ndarray:
    return v[..., :3] / v[..., -1:]
