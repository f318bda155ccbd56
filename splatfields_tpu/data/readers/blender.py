"""Blender synthetic dataset readers (NeRF-synthetic), host NumPy.

Parity targets (reference ``scene/dataset_readers.py``):
- ``readCamerasFromTransformsCV`` (:451-735): OpenCV-convention poses
  (c2w @ diag(1,-1,-1,1)), per-scene world rescale
  (2 / model_scale_dict[scene]), alpha-composited white/black background,
  focal from camera_angle_x applied at image height (reference quirk).
- ``readNerfSyntheticCVInfo`` (:662-871) registered as "Blender_cv": k-means
  selection of ``n_views`` train cameras, point init modes
  load / random / hull.
- ``readCamerasFromTransforms`` / ``readNerfSyntheticInfo`` (:414-659):
  the D-NeRF convention variant (registered "Blender" but unreachable from
  Scene — kept for capability parity).
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from splatfields_tpu.data.point_init import (
    mask_filter_points,
    random_cube_points,
    visual_hull_from_grid,
)
from splatfields_tpu.data.ply import fetch_pointcloud, store_pointcloud
from splatfields_tpu.data.types import BasicPointCloud, CameraInfo, SceneInfo
from splatfields_tpu.utils.camera_math import (
    focal2fov,
    fov2focal,
    get_nerfpp_norm,
    get_world2view,
)

BLENDER_TO_OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)

MODEL_SCALE = dict(chair=2.1, drums=2.3, ficus=2.3, hotdog=3.0, lego=2.4,
                   materials=2.4, mic=2.5, ship=2.75)


def kmeans_downsample(points: np.ndarray, n: int) -> list[int]:
    """Pick the camera nearest each k-means cluster center (reference
    :40-42)."""
    from sklearn.cluster import KMeans
    km = KMeans(n, random_state=0).fit(points)
    return ((points - km.cluster_centers_[..., None, :]) ** 2).sum(-1).argmin(-1).tolist()


def nerfpp_norm_from_infos(cam_infos) -> dict:
    w2cs = []
    for c in cam_infos:
        w2cs.append(get_world2view(c.R, c.T).astype(np.float64))
    return get_nerfpp_norm(w2cs)


def read_cameras_from_transforms_cv(path, transformsfile, white_background,
                                    extension=".png", load_time_step=10**6):
    """OpenCV-convention Blender loader. Returns (cam_infos, cam_positions)."""
    import PIL.Image

    obj_name = os.path.basename(os.path.normpath(path))
    world_scale = 2.0 / MODEL_SCALE.get(obj_name, 2.0)
    cam_infos, cam_pos = [], []

    with open(os.path.join(path, transformsfile)) as jf:
        contents = json.load(jf)
    frames = contents["frames"][:load_time_step]
    for idx, frame in enumerate(frames):
        cam_name = frame["file_path"] + extension
        frame_time = frame.get("time", 0)
        tfm = np.array(frame["transform_matrix"], np.float64) @ BLENDER_TO_OPENCV
        tfm[:3, :4] *= world_scale
        cam_pos.append(tfm[:3, 3].copy())

        w2c = np.linalg.inv(tfm)
        R, T = np.transpose(w2c[:3, :3]), w2c[:3, 3]

        image_path = os.path.join(path, cam_name)
        pil = PIL.Image.open(image_path)
        im = np.array(pil.convert("RGBA"), np.float32) / 255.0
        bg = np.array([1, 1, 1] if white_background else [0, 0, 0], np.float32)
        mask = im[..., 3]
        rgb = im[..., :3] * im[..., 3:4] + bg * (1 - im[..., 3:4])

        w, h = pil.size
        # reference quirk: focal from camera_angle_x applied at h/2
        focal = (h / 2) / np.tan(contents["camera_angle_x"] / 2)
        fovy = focal2fov(focal, h)
        fovx = focal2fov(focal, w)
        K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])

        cam_infos.append(CameraInfo(
            uid=idx, R=R, T=T, FovY=fovy, FovX=fovx, image=rgb,
            image_path=image_path, image_name=Path(cam_name).stem,
            width=w, height=h, fid=frame_time, mask=mask, K=K))
    return cam_infos, np.stack(cam_pos, 0)


def read_cameras_from_transforms(path, transformsfile, white_background,
                                 extension=".png", load_time_step=10**6):
    """D-NeRF convention loader (reference :414-449): c2w with y/z flipped
    after inversion, fovy computed via fov2focal round trip."""
    import PIL.Image
    cam_infos = []
    with open(os.path.join(path, transformsfile)) as jf:
        contents = json.load(jf)
    fovx = contents["camera_angle_x"]
    frames = contents["frames"][:load_time_step]
    for idx, frame in enumerate(frames):
        cam_name = frame["file_path"] + extension
        frame_time = frame.get("time", 0)
        c2w = np.array(frame["transform_matrix"], np.float64)
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R, T = np.transpose(w2c[:3, :3]), w2c[:3, 3]

        image_path = os.path.join(path, cam_name)
        pil = PIL.Image.open(image_path)
        im = np.array(pil.convert("RGBA"), np.float32) / 255.0
        bg = np.array([1, 1, 1] if white_background else [0, 0, 0], np.float32)
        mask = im[..., 3]
        rgb = im[..., :3] * im[..., 3:4] + bg * (1 - im[..., 3:4])
        w, h = pil.size
        fovy = focal2fov(fov2focal(fovx, w), h)
        cam_infos.append(CameraInfo(
            uid=idx, R=R, T=T, FovY=fovy, FovX=fovx, image=rgb,
            image_path=image_path, image_name=Path(cam_name).stem,
            width=w, height=h, fid=frame_time, mask=mask))
    return cam_infos


def _build_point_cloud(pts_samples, train_cams, num_pts, max_num_pts,
                       pc_path, scene_dir, seed=0):
    rng = np.random.RandomState(seed)
    if pts_samples == "load":
        assert pc_path and os.path.exists(pc_path), f"missing pc_path {pc_path}"
        xyz, _, _ = fetch_pointcloud(pc_path)
        keep = mask_filter_points(xyz, train_cams)
        xyz = xyz[keep]
        if 0 < max_num_pts < xyz.shape[0]:
            xyz = xyz[rng.choice(xyz.shape[0], max_num_pts, replace=False)]
        colors = rng.random((xyz.shape[0], 3)).astype(np.float32) / 255.0
    elif pts_samples == "random":
        xyz, colors = random_cube_points(num_pts, rng=rng)
    elif pts_samples == "hull":
        xyz = visual_hull_from_grid(train_cams, (-1.0, 1.0), 256, num_pts,
                                    rng=rng)
        colors = rng.random((xyz.shape[0], 3)).astype(np.float32) / 255.0
    else:
        raise NotImplementedError(f"pts_samples='{pts_samples}'")
    return xyz.astype(np.float32), colors


def read_nerf_synthetic_cv(path, white_background, eval_mode,
                           extension=".png", load_time_step=10**6,
                           n_views=6, num_pts=100_000, max_num_pts=-1,
                           pts_samples="load", pc_path="",
                           output_ply_path=None):
    """The "Blender_cv" scene callback (reference :662-871)."""
    train_cam_infos, cam_pose = read_cameras_from_transforms_cv(
        path, "transforms_train.json", white_background, extension)
    selected = sorted(kmeans_downsample(cam_pose, n_views))
    train_cam_infos = [train_cam_infos[i] for i in selected]

    test_cam_infos, _ = read_cameras_from_transforms_cv(
        path, "transforms_test.json", white_background, extension)
    if not eval_mode:
        train_cam_infos = train_cam_infos + test_cam_infos
        test_cam_infos = []

    nerf_normalization = nerfpp_norm_from_infos(train_cam_infos)

    xyz, colors = _build_point_cloud(
        pts_samples, train_cam_infos, num_pts, max_num_pts, pc_path, path)
    import tempfile, uuid
    ply_path = output_ply_path or os.path.join(
        tempfile.gettempdir(), f"splatfields_init_{uuid.uuid4().hex}.ply")
    store_pointcloud(ply_path, xyz, colors)
    pcd = BasicPointCloud(points=xyz, colors=colors,
                          normals=np.zeros_like(xyz))
    return SceneInfo(
        point_cloud=pcd, train_cameras=train_cam_infos,
        test_cameras=test_cam_infos, pred_cameras=test_cam_infos,
        nerf_normalization=nerf_normalization, ply_path=ply_path)


def read_nerf_synthetic(path, white_background, eval_mode, extension=".png",
                        load_time_step=10**6, num_pts=100_000,
                        max_num_pts=-1, pts_samples="random", pc_path="",
                        **_):
    """The D-NeRF-convention "Blender" callback (reference :519-659)."""
    train_cam_infos = read_cameras_from_transforms(
        path, "transforms_train.json", white_background, extension,
        load_time_step)
    test_cam_infos = read_cameras_from_transforms(
        path, "transforms_test.json", white_background, extension,
        load_time_step)
    if not eval_mode:
        train_cam_infos = train_cam_infos + test_cam_infos
        test_cam_infos = []
    nerf_normalization = nerfpp_norm_from_infos(train_cam_infos)
    xyz, colors = _build_point_cloud(
        pts_samples, train_cam_infos, num_pts, max_num_pts, pc_path, path)
    import tempfile, uuid
    ply_path = os.path.join(
        tempfile.gettempdir(), f"splatfields_init_{uuid.uuid4().hex}.ply")
    store_pointcloud(ply_path, xyz, colors)
    pcd = BasicPointCloud(points=xyz, colors=colors,
                          normals=np.zeros_like(xyz))
    return SceneInfo(
        point_cloud=pcd, train_cameras=train_cam_infos,
        test_cameras=test_cam_infos, pred_cameras=test_cam_infos,
        nerf_normalization=nerf_normalization, ply_path=ply_path)
