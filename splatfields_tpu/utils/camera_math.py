"""Camera matrix construction (NumPy, host-side) matching 3DGS conventions.

Parity targets: reference ``utils/graphics_utils.py:34-84`` (world-to-view,
OpenGL-ish projection with z in [0, zfar/(zfar-znear)], fov<->focal) and
``scene/dataset_readers.py:141-162`` (``getNerfppNorm`` camera bounding
sphere). Host-side NumPy: these run once per camera at scene load; the
device-side consumers receive stacked float32 arrays.
"""
from __future__ import annotations

import math

import numpy as np


def get_world2view(R: np.ndarray, t: np.ndarray,
                   translate: np.ndarray | None = None,
                   scale: float = 1.0) -> np.ndarray:
    """World-to-view 4x4 from COLMAP-style (R, t).

    R is the camera-to-world rotation (so its transpose goes into the W2V
    matrix), t the world-to-camera translation — reference
    ``utils/graphics_utils.py:42-53`` (``getWorld2View2``).
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def get_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection used by the 3DGS rasterizer (reference
    ``utils/graphics_utils.py:56-76``): maps view z to [0, zfar/(zfar-znear)]
    and keeps w = z."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P)


def get_projection_matrix_cxcy(znear: float, zfar: float,
                               fx: float, fy: float, cx: float, cy: float,
                               width: int, height: int) -> np.ndarray:
    """Intrinsics-based projection for off-center principal points — the
    ``CameraPenoptic`` path (reference ``scene/cameras.py:133-137``)."""
    P = np.zeros((4, 4))
    P[0, 0] = 2 * fx / width
    P[1, 1] = 2 * fy / height
    P[0, 2] = 2 * (cx / width) - 1
    P[1, 2] = 2 * (cy / height) - 1
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_nerfpp_norm(w2c_list: list[np.ndarray]) -> dict:
    """Camera-center bounding sphere -> {translate, radius}.

    Reference ``scene/dataset_readers.py:141-162``: centers' mean + max
    distance * 1.1, translate = -center.
    """
    cam_centers = []
    for w2c in w2c_list:
        c2w = np.linalg.inv(w2c)
        cam_centers.append(c2w[:3, 3:4])
    cam_centers = np.hstack(cam_centers)
    avg = np.mean(cam_centers, axis=1, keepdims=True)
    dist = np.linalg.norm(cam_centers - avg, axis=0, keepdims=True)
    diagonal = np.max(dist)
    radius = diagonal * 1.1
    translate = -avg[:, 0]
    return {"translate": translate, "radius": radius}
