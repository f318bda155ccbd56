"""Point-cloud initialization: random boxes, visual-hull carving, mask
filtering, depth unprojection (host NumPy).

Parity targets: reference ``scene/dataset_readers.py`` —
- projective mask filtering of a loaded PLY (`pts_samples='load'`,
  :735-782),
- 256^3 visual-hull grid carving from train masks (`pts_samples='hull'`,
  :796-856),
- random cube init (:783-790),
- NeuS-style ``visual_hull_samples`` with per-camera K/RT projection
  (:1385-1417) and depth-map unprojection (:1476-1491).

Note: the reference's in-bounds test compares u against the image *height*
and v against the *width* (``:764-767``; PIL ``size`` is (W, H)) — harmless
for its square datasets. We bound u by width and v by height.
"""
from __future__ import annotations

import numpy as np


def _project_full(xyz: np.ndarray, full_proj: np.ndarray,
                  width: int, height: int):
    """Project with the transposed full projection matrix; returns integer
    pixel coords and validity."""
    ones = np.ones((xyz.shape[0], 1), xyz.dtype)
    clip = np.concatenate([xyz, ones], 1) @ full_proj
    uv = clip[:, :2] / clip[:, 2:3]
    u = np.round(((uv[:, 0] + 1) * width - 1) * 0.5).astype(int)
    v = np.round(((uv[:, 1] + 1) * height - 1) * 0.5).astype(int)
    inb = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return u, v, inb


def mask_filter_points(xyz: np.ndarray, cameras: list,
                       use_native: bool = True) -> np.ndarray:
    """Keep points whose projection lands inside the mask of EVERY training
    camera (reference 'load' mode). ``cameras`` are host Camera objects with
    full_proj_transform and mask [1,H,W] (or CameraInfo with .mask [H,W]).

    Uses the multithreaded C++ carver (splatfields_tpu/native) when the
    toolchain is available; NumPy loop otherwise."""
    if use_native:
        try:
            from splatfields_tpu import native
            if native.available():
                mats = np.stack([
                    np.asarray(_camera_full_proj(c), np.float32)
                    for c in cameras])
                masks = [_camera_mask(c)[2] for c in cameras]
                return native.carve_points(
                    xyz.astype(np.float32), mats, masks, mode=0)
        except Exception:
            pass
    keep = np.ones(xyz.shape[0], bool)
    for cam in cameras:
        full = _camera_full_proj(cam)
        w, h, mask = _camera_mask(cam)
        u, v, inb = _project_full(xyz, full, w, h)
        m = inb.copy()
        idx = np.where(inb)[0]
        m[idx] = mask[v[idx], u[idx]] > 0
        keep &= m
    return keep


def _camera_full_proj(cam):
    if hasattr(cam, "full_proj_transform") and cam.full_proj_transform is not None:
        return cam.full_proj_transform
    # CameraInfo: build from R, T, fov
    from splatfields_tpu.data.cameras import Camera
    c = Camera(uid=0, colmap_id=0, R=cam.R, T=cam.T, FoVx=cam.FovX,
               FoVy=cam.FovY, image_name="", image_width=cam.width,
               image_height=cam.height, fid=0.0)
    return c.full_proj_transform


def _camera_mask(cam):
    mask = cam.mask
    if mask is None:
        raise ValueError("hull carving requires masks")
    mask = np.asarray(mask)
    if mask.ndim == 3:
        mask = mask[0] if mask.shape[0] == 1 else mask[..., 0]
    h, w = mask.shape
    return w, h, mask


def visual_hull_from_grid(cameras: list, aabb=(-1.0, 1.0),
                          grid_resolution: int = 256,
                          num_pts: int = 100_000,
                          rng: np.random.RandomState | None = None):
    """Carve a dense grid by the training masks (reference 'hull' mode).

    Returns [M, 3] points subsampled to num_pts.
    """
    rng = rng or np.random
    grid = np.linspace(aabb[0], aabb[1], grid_resolution)
    gx, gy, gz = np.meshgrid(grid, grid, grid)
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    keep = mask_filter_points(pts, cameras)
    pts = pts[keep]
    if pts.shape[0] > num_pts:
        pts = pts[rng.choice(pts.shape[0], num_pts, replace=False)]
    return pts


def random_cube_points(num_pts: int, low: float = -1.3, high: float = 1.3,
                       rng: np.random.RandomState | None = None):
    """Uniform cube init (reference :783-790: [-1.3, 1.3]^3)."""
    rng = rng or np.random
    xyz = rng.random((num_pts, 3)) * (high - low) + low
    colors = rng.random((num_pts, 3)) / 255.0
    return xyz.astype(np.float32), colors.astype(np.float32)


def visual_hull_samples_krt(masks: np.ndarray, KRT: np.ndarray,
                            n_pts: int = 100_000,
                            grid_resolution: int = 64,
                            aabb=(-1.0, 1.0),
                            seed: int = 0):
    """NeuS-style hull sampling with explicit 3x4 projections (reference
    ``visual_hull_samples``, :1385-1417): carve a coarse grid by all masks,
    then sample points uniformly inside the surviving voxels.

    Args:
        masks: [C, H, W] binary.
        KRT: [C, 3, 4] projection matrices (pixel = KRT @ [x 1]).
    """
    rng = np.random.RandomState(seed)
    grid = np.linspace(aabb[0], aabb[1], grid_resolution)
    gx, gy, gz = np.meshgrid(grid, grid, grid, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    keep = np.ones(pts.shape[0], bool)
    h, w = masks.shape[1:]
    for ci in range(KRT.shape[0]):
        ones = np.ones((pts.shape[0], 1))
        pix = (KRT[ci] @ np.concatenate([pts, ones], 1).T).T
        u = np.round(pix[:, 0] / np.maximum(pix[:, 2], 1e-8)).astype(int)
        v = np.round(pix[:, 1] / np.maximum(pix[:, 2], 1e-8)).astype(int)
        inb = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (pix[:, 2] > 0)
        m = inb.copy()
        idx = np.where(inb)[0]
        m[idx] = masks[ci][v[idx], u[idx]] > 0
        keep &= m
    occupied = pts[keep]
    if occupied.shape[0] == 0:
        return random_cube_points(n_pts, aabb[0], aabb[1],
                                  np.random.RandomState(seed))[0]
    # jitter samples inside occupied voxels
    voxel = (aabb[1] - aabb[0]) / (grid_resolution - 1)
    choice = rng.choice(occupied.shape[0], n_pts, replace=True)
    jitter = (rng.random((n_pts, 3)) - 0.5) * voxel
    return (occupied[choice] + jitter).astype(np.float32)


def unproject_depths(depths: np.ndarray, masks: np.ndarray,
                     K: np.ndarray, c2w: np.ndarray,
                     max_pts: int = 200_000, seed: int = 0):
    """Depth maps -> world points (reference ``_gen_3dpoints``, :1476-1491).

    Args:
        depths: [C, H, W]; masks: [C, H, W]; K: [C, 3, 3]; c2w: [C, 4, 4].
    """
    rng = np.random.RandomState(seed)
    out = []
    for ci in range(depths.shape[0]):
        d = depths[ci]
        m = (masks[ci] > 0) & (d > 0)
        v, u = np.nonzero(m)
        z = d[v, u]
        uv1 = np.stack([u + 0.5, v + 0.5, np.ones_like(z)], 0)
        cam_pts = np.linalg.inv(K[ci]) @ (uv1 * z)
        world = c2w[ci] @ np.concatenate(
            [cam_pts, np.ones_like(cam_pts[:1])], 0)
        out.append(world[:3].T)
    pts = np.concatenate(out, 0).astype(np.float32)
    if pts.shape[0] > max_pts:
        pts = pts[rng.choice(pts.shape[0], max_pts, replace=False)]
    return pts
