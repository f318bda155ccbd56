"""Host-side camera objects and the resolution policy.

Parity targets:
- ``scene/cameras.py:18-88`` (``Camera``): world_view_transform stored
  transposed (right-multiply convention), projection from fov, full_proj =
  view @ proj, camera_center from the inverse, znear 0.01 / zfar 100,
  time id ``fid``.
- ``utils/camera_utils.py:21-113`` (``loadCam`` resolution policy: -r in
  {1,2,4,8} divides, -1 caps width at ``max_resolution`` (default 800,
  1600-wide inputs get halved); ``camera_to_JSON``).

Device staging: :func:`stack_cameras` packs a camera list into one pytree of
float32 arrays (matrices, fovs, fids) for scan-friendly consumption; images
are staged per-view (the TPU analogue of ``load2gpu_on_the_fly``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from splatfields_tpu.data.types import CameraInfo
from splatfields_tpu.utils.camera_math import (
    focal2fov,
    fov2focal,
    get_projection_matrix,
    get_projection_matrix_cxcy,
    get_world2view,
)

ZNEAR, ZFAR = 0.01, 100.0


@dataclasses.dataclass
class Camera:
    uid: int
    colmap_id: int
    R: np.ndarray
    T: np.ndarray
    FoVx: float
    FoVy: float
    image_name: str
    image_width: int
    image_height: int
    fid: float
    image: Optional[np.ndarray] = None    # [3,H,W] float32
    mask: Optional[np.ndarray] = None     # [1,H,W] float32
    depth: Optional[np.ndarray] = None    # [H,W] float32
    world_view_transform: np.ndarray = None  # [4,4] transposed W2V
    projection_matrix: np.ndarray = None
    full_proj_transform: np.ndarray = None
    camera_center: np.ndarray = None
    trans: np.ndarray = None
    scale: float = 1.0

    def __post_init__(self):
        if self.trans is None:
            self.trans = np.zeros(3)
        if self.world_view_transform is None:
            self.world_view_transform = get_world2view(
                self.R, self.T, self.trans, self.scale).T.astype(np.float32)
        if self.projection_matrix is None:
            self.projection_matrix = get_projection_matrix(
                ZNEAR, ZFAR, self.FoVx, self.FoVy).T.astype(np.float32)
        if self.full_proj_transform is None:
            self.full_proj_transform = (
                self.world_view_transform @ self.projection_matrix
            ).astype(np.float32)
        if self.camera_center is None:
            self.camera_center = np.linalg.inv(
                self.world_view_transform.T)[:3, 3].astype(np.float32)

    @property
    def tanfovx(self) -> float:
        import math
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self) -> float:
        import math
        return math.tan(self.FoVy * 0.5)


def make_penoptic_camera(uid, colmap_id, R, T, K, width, height, image_name,
                         fid, image=None, mask=None, depth=None) -> Camera:
    """Intrinsics-based camera (off-center principal point) — reference
    ``CameraPenoptic`` (``scene/cameras.py:90-161``)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    fovx = focal2fov(fx, width)
    fovy = focal2fov(fy, height)
    w2v = get_world2view(R, T).T.astype(np.float32)
    proj = get_projection_matrix_cxcy(
        ZNEAR, ZFAR, fx, fy, cx, cy, width, height).T.astype(np.float32)
    return Camera(
        uid=uid, colmap_id=colmap_id, R=R, T=T, FoVx=fovx, FoVy=fovy,
        image_name=image_name, image_width=width, image_height=height,
        fid=fid, image=image, mask=mask, depth=depth,
        world_view_transform=w2v, projection_matrix=proj,
        full_proj_transform=(w2v @ proj).astype(np.float32),
        camera_center=np.linalg.inv(w2v.T)[:3, 3].astype(np.float32),
    )


_warned_big = [False]


def load_cam(cam_info: CameraInfo, resolution: int, uid: int,
             resolution_scale: float = 1.0, max_resolution: int = 800) -> Camera:
    """Resolution policy + resize (reference ``utils/camera_utils.py:21-81``)."""
    import PIL.Image

    orig_w, orig_h = cam_info.width, cam_info.height
    if resolution in (1, 2, 4, 8):
        scale = resolution_scale * resolution
        new_w, new_h = round(orig_w / scale), round(orig_h / scale)
    else:
        if resolution == -1:
            if orig_w > 1600:
                if not _warned_big[0]:
                    _warned_big[0] = True
                global_down = orig_w / 1600
            else:
                global_down = orig_w / min(orig_w, max_resolution)
        else:
            global_down = orig_w / resolution
        scale = float(global_down) * resolution_scale
        new_w, new_h = int(orig_w / scale), int(orig_h / scale)

    image = mask = depth = None
    if cam_info.image is not None:
        pil = PIL.Image.fromarray(
            (np.clip(cam_info.image, 0, 1) * 255).astype(np.uint8))
        pil = pil.resize((new_w, new_h))
        image = np.asarray(pil).astype(np.float32) / 255.0
        image = image.transpose(2, 0, 1)[:3]  # [3,H,W]
    if cam_info.mask is not None:
        pm = PIL.Image.fromarray(
            (np.clip(cam_info.mask, 0, 1) * 255).astype(np.uint8))
        pm = pm.resize((new_w, new_h))
        mask = (np.asarray(pm).astype(np.float32) / 255.0)[None]
    if cam_info.depth is not None:
        import cv2
        depth = cv2.resize(cam_info.depth, (new_w, new_h),
                           interpolation=cv2.INTER_NEAREST)

    return Camera(
        uid=uid, colmap_id=cam_info.uid, R=cam_info.R, T=cam_info.T,
        FoVx=cam_info.FovX, FoVy=cam_info.FovY, image=image, mask=mask,
        depth=depth, image_name=cam_info.image_name,
        image_width=new_w, image_height=new_h, fid=cam_info.fid)


def camera_list_from_cam_infos(cam_infos, resolution_scale, resolution,
                               max_resolution: int = 800):
    return [
        load_cam(c, resolution, idx, resolution_scale, max_resolution)
        for idx, c in enumerate(cam_infos)
    ]


def camera_to_json(idx: int, camera: CameraInfo) -> dict:
    """reference ``camera_to_JSON`` (``utils/camera_utils.py:93-113``)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = camera.R.transpose()
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": idx,
        "img_name": camera.image_name,
        "width": camera.width,
        "height": camera.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(camera.FovY, camera.height),
        "fx": fov2focal(camera.FovX, camera.width),
    }


def stack_cameras(cams: list) -> dict:
    """Pack per-camera render constants into stacked float32 arrays."""
    return {
        "viewmatrix": np.stack([c.world_view_transform for c in cams]),
        "projmatrix": np.stack([c.full_proj_transform for c in cams]),
        "campos": np.stack([c.camera_center for c in cams]),
        "tanfovx": np.array([c.tanfovx for c in cams], np.float32),
        "tanfovy": np.array([c.tanfovy for c in cams], np.float32),
        "fid": np.array([c.fid for c in cams], np.float32),
    }


@dataclasses.dataclass
class MiniCam:
    """Image-less render camera built from precomputed matrices — the
    reference's viewer-side camera (``scene/cameras.py:164-175``), used
    when only matrices exist (interactive orbit preview, custom paths).
    Duck-types the ``Camera`` attributes the render path reads."""
    image_width: int
    image_height: int
    FoVy: float
    FoVx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray   # [4,4], transposed W2V
    full_proj_transform: np.ndarray    # [4,4]
    camera_center: np.ndarray = None
    fid: float = 0.0
    image_name: str = "minicam"

    def __post_init__(self):
        if self.camera_center is None:
            self.camera_center = np.linalg.inv(
                np.asarray(self.world_view_transform).T)[:3, 3].astype(
                    np.float32)

    @property
    def tanfovx(self) -> float:
        import math
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self) -> float:
        import math
        return math.tan(self.FoVy * 0.5)
