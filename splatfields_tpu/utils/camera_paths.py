"""Camera path generation for visualization renders (host NumPy + SciPy).

Parity targets:
- ``utils/camera_utils_multinerf.py``: B-spline interpolated paths between
  keyframe poses (:20-66), PCA pose normalization (:78-112).
- ``utils/pose_utils.py``: spherical orbit poses and the wander path.
"""
from __future__ import annotations

import numpy as np
import scipy.interpolate


def viewmatrix(lookdir, up, position):
    def normalize(x):
        return x / np.linalg.norm(x)
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def generate_interpolated_path(poses, n_interp, spline_degree=5,
                               smoothness=0.03, rot_weight=0.1):
    """Smooth B-spline between [n, 3, 4] keyframe c2w poses."""
    def poses_to_points(poses, dist):
        pos = poses[:, :3, -1]
        lookat = poses[:, :3, -1] - dist * poses[:, :3, 2]
        up = poses[:, :3, -1] + dist * poses[:, :3, 1]
        return np.stack([pos, lookat, up], 1)

    def points_to_poses(points):
        return np.array([viewmatrix(p - l, u - p, p) for p, l, u in points])

    def interp(points, n, k, s):
        sh = points.shape
        pts = np.reshape(points, (sh[0], -1))
        k = min(k, sh[0] - 1)
        tck, _ = scipy.interpolate.splprep(pts.T, k=k, s=s)
        u = np.linspace(0, 1, n, endpoint=False)
        new_points = np.array(scipy.interpolate.splev(u, tck))
        return np.reshape(new_points.T, (n, sh[1], sh[2]))

    points = poses_to_points(poses, dist=rot_weight)
    new_points = interp(points, n_interp * (points.shape[0] - 1),
                        k=spline_degree, s=smoothness)
    return points_to_poses(new_points)


def pad_poses(p):
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def transform_poses_pca(poses):
    """Recenter/realign poses by PCA of camera centers; scale into the
    [-1,1]^3 cube. Returns (poses, transform)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean
    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, inds]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_recentered = unpad_poses(transform @ pad_poses(poses))
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)
    if poses_recentered.mean(axis=0)[2, 1] < 0:
        poses_recentered = np.diag(np.array([1, -1, -1])) @ poses_recentered
        transform = np.diag(np.array([1, -1, -1, 1])) @ transform
    scale = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
    poses_recentered[:, :3, 3] *= scale
    transform = np.diag(np.array([scale] * 3 + [1])) @ transform
    return poses_recentered, transform


def pose_spherical(theta, phi, radius):
    """Spherical orbit c2w (reference ``utils/pose_utils.py``)."""
    def trans_t(t):
        return np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                         [0, 0, 1, t], [0, 0, 0, 1]], np.float32)

    def rot_phi(phi):
        c, s = np.cos(phi), np.sin(phi)
        return np.array([[1, 0, 0, 0], [0, c, -s, 0],
                         [0, s, c, 0], [0, 0, 0, 1]], np.float32)

    def rot_theta(th):
        c, s = np.cos(th), np.sin(th)
        return np.array([[c, 0, -s, 0], [0, 1, 0, 0],
                         [s, 0, c, 0], [0, 0, 0, 1]], np.float32)

    c2w = trans_t(radius)
    c2w = rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
    c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                    [0, 1, 0, 0], [0, 0, 0, 1]], np.float32) @ c2w
    return c2w
