"""Bilinear grid sampling matching ``torch.nn.functional.grid_sample``.

The reference samples learned/generated feature planes with grid_sample
(``scene/tripFields.py:96,434`` — default args: mode='bilinear',
padding_mode='zeros', align_corners=False) and 3-D grids
(``scene/tripFields.py:114``). On TPU this is a gather + lerp; gathers of
[C, H, W] planes at N points vectorize cleanly on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] to pixel index space (torch convention)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = False,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample a [C, H, W] plane at [N, 2] normalized (x, y) coords.

    torch layout note: grid_sample's last-dim order is (x, y) where x indexes
    W and y indexes H.

    Returns [N, C].
    """
    C, H, W = plane.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        if padding_mode == "border":
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            return plane[:, iyc, ixc]  # [C, N]
        # zeros padding: clamp for the gather, zero the weight outside
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        return plane[:, iyc, ixc] * inb.astype(plane.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)
        + gather(x1, y0) * (wx1 * wy0)
        + gather(x0, y1) * (wx0 * wy1)
        + gather(x1, y1) * (wx1 * wy1)
    )
    return out.T  # [N, C]


def _corners_2d(coords, H, W, align_corners):
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    corners = []
    for iy, wy in ((y0, 1.0 - wy1), (y0 + 1, wy1)):
        for ix, wx in ((x0, 1.0 - wx1), (x0 + 1, wx1)):
            inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            corners.append((iyc, ixc, wx * wy * inb.astype(jnp.float32)))
    return corners


@jax.custom_vjp
def grid_sample_2d_const_coords(plane: jnp.ndarray,
                                coords: jnp.ndarray) -> jnp.ndarray:
    """:func:`grid_sample_2d` (zeros padding, align_corners=False) with a
    TPU-tuned layout per direction and COORDS TREATED AS CONSTANTS.

    Forward gathers ROWS of the [H*W, C] pixel-major layout (each gathered
    row is one contiguous tile fetch — measured 3.7 ms vs 6.2 ms for the
    [C, H, W] advanced-index form at 100k points on v5e), while the
    backward scatter-adds in the channel-major [C, H, W] layout (measured
    4.3 ms vs 6.8 ms for the row-major scatter). Autodiff cannot mix the
    two layouts, hence the custom VJP.

    The coords cotangent is ZERO by construction — callers must only use
    this where coords carry no gradient (the field encoders sample at
    stop_gradient'd splat positions; see train_lib.field_attributes).
    """
    C, H, W = plane.shape
    rows = plane.reshape(C, H * W).T
    out = None
    for iyc, ixc, w in _corners_2d(coords, H, W, False):
        v = rows[iyc * W + ixc] * w[:, None]
        out = v if out is None else out + v
    return out


def _gs2_fwd(plane, coords):
    return grid_sample_2d_const_coords(plane, coords), (plane.shape, coords)


def _gs2_bwd(res, g):
    (C, H, W), coords = res
    gT = g.T  # [C, N]
    grad = jnp.zeros((C, H, W), g.dtype)
    for iyc, ixc, w in _corners_2d(coords, H, W, False):
        grad = grad.at[:, iyc, ixc].add(gT * w[None, :])
    return grad, jnp.zeros_like(coords)


grid_sample_2d_const_coords.defvjp(_gs2_fwd, _gs2_bwd)


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = False,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample a [C, D, H, W] grid at [N, 3] normalized (x, y, z) coords.

    torch convention: coords last dim is (x, y, z) indexing (W, H, D).

    Returns [N, C].
    """
    C, D, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    z = _unnormalize(coords[..., 2], D, align_corners)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0

    def gather(ix, iy, iz):
        if padding_mode == "border":
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
            return grid[:, izc, iyc, ixc]
        inb = (
            (ix >= 0) & (ix <= W - 1)
            & (iy >= 0) & (iy <= H - 1)
            & (iz >= 0) & (iz <= D - 1)
        )
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        return grid[:, izc, iyc, ixc] * inb.astype(grid.dtype)

    out = (
        gather(x0, y0, z0) * ((1 - fx) * (1 - fy) * (1 - fz))
        + gather(x0 + 1, y0, z0) * (fx * (1 - fy) * (1 - fz))
        + gather(x0, y0 + 1, z0) * ((1 - fx) * fy * (1 - fz))
        + gather(x0 + 1, y0 + 1, z0) * (fx * fy * (1 - fz))
        + gather(x0, y0, z0 + 1) * ((1 - fx) * (1 - fy) * fz)
        + gather(x0 + 1, y0, z0 + 1) * (fx * (1 - fy) * fz)
        + gather(x0, y0 + 1, z0 + 1) * ((1 - fx) * fy * fz)
        + gather(x0 + 1, y0 + 1, z0 + 1) * (fx * fy * fz)
    )
    return out.T
