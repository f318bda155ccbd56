"""NumPy sequential oracle for the Gaussian rasterizer (tests only).

An independent, deliberately naive re-implementation of the CUDA pipeline
semantics (preprocess + per-pixel front-to-back sequential blend, upstream
``ingra14m/depth-diff-gaussian-rasterization``) used as the golden reference
for the TPU rasterizer's forward outputs. Sequential over splats, vectorized
over pixels; no tiling, no chunking — a completely different code path from
``blend_jax``/``blend_pallas`` so agreement is meaningful.
"""
from __future__ import annotations

import numpy as np


def rasterize_oracle(
    means3d, scales, rotations, opacities, viewmatrix, projmatrix, campos,
    bg, tanfovx, tanfovy, width, height,
    colors_precomp=None, shs=None, sh_degree=0, scale_modifier=1.0,
):
    n = means3d.shape[0]
    focal_x = width / (2 * tanfovx)
    focal_y = height / (2 * tanfovy)

    ones = np.ones((n, 1), np.float32)
    ph = np.concatenate([means3d, ones], 1)
    p_view = ph @ viewmatrix
    p_clip = ph @ projmatrix
    p_ndc = p_clip[:, :3] / (p_clip[:, 3:4] + 1e-7)

    # cov3d
    q = rotations / (np.linalg.norm(rotations, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        np.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        np.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], 1)
    L = R * (scales * scale_modifier)[:, None, :]
    cov3d = L @ np.transpose(L, (0, 2, 1))

    tz = p_view[:, 2]
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tx = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    Rw2v = viewmatrix[:3, :3].T
    J = np.zeros((n, 2, 3), np.float32)
    J[:, 0, 0] = focal_x / tz
    J[:, 0, 2] = -focal_x * tx / tz**2
    J[:, 1, 1] = focal_y / tz
    J[:, 1, 2] = -focal_y * ty / tz**2
    A = J @ Rw2v[None]
    cov2d = A @ cov3d @ np.transpose(A, (0, 2, 1))
    cxx = cov2d[:, 0, 0] + 0.3
    cyy = cov2d[:, 1, 1] + 0.3
    cxy = cov2d[:, 0, 1]
    det = cxx * cyy - cxy**2
    visible = (tz > 0.2) & (det != 0)
    inv_det = np.where(det != 0, 1.0 / np.where(det != 0, det, 1), 0.0)
    con_a, con_b, con_c = cyy * inv_det, -cxy * inv_det, cxx * inv_det
    mid = 0.5 * (cxx + cyy)
    radius = np.ceil(3 * np.sqrt(mid + np.sqrt(np.maximum(0.1, mid**2 - det))))
    radii = np.where(visible, radius, 0).astype(np.int32)

    mx = ((p_ndc[:, 0] + 1) * width - 1) * 0.5
    my = ((p_ndc[:, 1] + 1) * height - 1) * 0.5

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        from splatfields_tpu.ops.sh import eval_sh
        import jax.numpy as jnp
        dirs = means3d - campos[None]
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = np.maximum(
            np.asarray(eval_sh(sh_degree, jnp.asarray(np.swapaxes(shs, -1, -2)),
                               jnp.asarray(dirs))) + 0.5, 0.0)

    # sequential front-to-back blend
    order = np.argsort(np.where(visible, tz, np.inf), kind="stable")
    xs, ys = np.meshgrid(np.arange(width, dtype=np.float32),
                         np.arange(height, dtype=np.float32))
    C = np.zeros((height, width, 3), np.float32)
    D = np.zeros((height, width), np.float32)
    T = np.ones((height, width), np.float32)
    done = np.zeros((height, width), bool)
    op = opacities.reshape(-1)
    for i in order:
        if not visible[i] or radii[i] <= 0:
            continue
        # rect culling like CUDA (tile granularity 16)
        ts = 16
        x0 = max(0, int((mx[i] - radii[i]) / ts)) * ts
        y0 = max(0, int((my[i] - radii[i]) / ts)) * ts
        x1 = min(width, int((mx[i] + radii[i] + ts - 1) / ts) * ts)
        y1 = min(height, int((my[i] + radii[i] + ts - 1) / ts) * ts)
        if x0 >= x1 or y0 >= y1:
            continue
        sl = np.s_[y0:y1, x0:x1]
        dx = mx[i] - xs[sl]
        dy = my[i] - ys[sl]
        power = -0.5 * (con_a[i] * dx**2 + con_c[i] * dy**2) - con_b[i] * dx * dy
        alpha = np.minimum(0.99, op[i] * np.exp(power))
        active = (power <= 0) & (alpha >= 1 / 255) & ~done[sl]
        test_t = T[sl] * (1 - alpha)
        trig = active & (test_t < 1e-4)
        apply = active & ~trig
        w = np.where(apply, alpha * T[sl], 0.0)
        C[sl] += w[..., None] * rgb[i][None, None]
        D[sl] += w * tz[i]
        T[sl] = np.where(apply, test_t, T[sl])
        done[sl] |= trig
    C += T[..., None] * bg[None, None]
    return {
        "color": np.transpose(C, (2, 0, 1)),
        "depth": D[None],
        "alpha": (1 - T)[None],
        "radii": radii,
    }
