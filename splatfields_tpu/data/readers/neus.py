"""NeuS-convention readers: DTU static scans and ResFields/Owlii multi-cam
video (host NumPy).

Parity targets (reference ``scene/dataset_readers.py``):
- ``load_K_Rt_from_P`` (:118-138): decompose P = K [R|t] via
  cv2.decomposeProjectionMatrix.
- ``parse_cam`` (:1277-1285): per-frame P = world_mat @ scale_mat.
- ``readCamerasFromNeus`` (:1287-1383): per-camera dir with
  cameras_sphere.npz + image/ (or rgb/), mask/, depth/ subdirs; masks
  composited onto white/black bg; depth scale 1000 rescaled by
  1/scale_mat[0,0]; fid from the frame index.
- ``readNeuSceneInfo`` (:1493-1690) / ``readResFieldSceneInfo`` (:1692):
  train/test/pred camera-name lists, load_time_step frame filtering,
  normalization fixed to radius 1.0, point init
  vertices / random([-0.9, 0.9]) / hull (frame-0 masks) / depth.
- ``visual_hull_samples`` (:1385-1417): 256^3 grid carved by all frame-0
  masks via nearest grid-sample of mask values.
- ``readNeuSDTUInfo``/``readDTUCameras`` (:874-990): DTU cameras_sphere.npz
  with the axis-flip chain and random point init.
"""
from __future__ import annotations

import os
from glob import glob
from pathlib import Path

import numpy as np

from splatfields_tpu.data.ply import store_pointcloud
from splatfields_tpu.data.types import BasicPointCloud, CameraInfo, SceneInfo
from splatfields_tpu.utils.camera_math import focal2fov


def load_k_rt_from_p(P: np.ndarray):
    """K, pose (c2w 4x4) from a 3x4 projection (reference :118-138)."""
    import cv2
    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return K.astype(np.float32), pose


def parse_cam(scale_mats, world_mats):
    intr, poses = [], []
    for sm, wm in zip(scale_mats, world_mats):
        P = (wm @ sm)[:3, :4]
        K, pose = load_k_rt_from_p(P)
        intr.append(K)
        poses.append(pose)
    return np.stack(intr), np.stack(poses)


def read_cameras_from_neus(data_dir, white_background, keep_fid=None,
                           fid_value=None):
    """Load one NeuS-style camera directory.

    Args:
        keep_fid: optional predicate frame_index -> bool (load_time_step
            filter).
        fid_value: fixed fid for all frames (static mode) or None to derive
            from frame index.
    Returns:
        (cam_infos, all_pc or None) where all_pc = (xyz, rgb) from depth.
    """
    import cv2

    if not os.path.exists(data_dir):
        raise FileNotFoundError(data_dir)
    images_lis = sorted(
        glob(os.path.join(data_dir, "image/*.png"))
        + glob(os.path.join(data_dir, "rgb/*.png"))
        + glob(os.path.join(data_dir, "rgb/*.jpg")))
    frame_ids = [int(os.path.splitext(os.path.basename(p))[0])
                 for p in images_lis]
    cam_dict = np.load(os.path.join(data_dir, "cameras_sphere.npz"))

    def _sample(lst):
        if keep_fid is None:
            return lst
        return [x for x, f in zip(lst, frame_ids) if keep_fid(f)]

    world_mats = _sample([cam_dict[f"world_mat_{i}"].astype(np.float32)
                          for i in frame_ids])
    scale_mats = _sample([cam_dict[f"scale_mat_{i}"].astype(np.float32)
                          for i in frame_ids])
    intr, poses = parse_cam(scale_mats, world_mats)

    img_paths = _sample(images_lis)
    mask_paths = _sample(sorted(glob(os.path.join(data_dir, "mask/*.png"))))
    depth_paths = _sample(sorted(glob(os.path.join(data_dir, "depth/*.png"))))

    images = np.stack([cv2.imread(p)[..., ::-1] for p in img_paths]) / 255.0
    c2w = poses[:, :3, :4]
    w2c_all = np.linalg.inv(poses)[:, :3, :4]

    has_masks = len(mask_paths) > 0
    masks = None
    if has_masks:
        masks = np.stack([cv2.imread(p) for p in mask_paths]) / 255.0
        if masks.ndim == 4:
            masks = masks[..., 0:1]
        bg = np.array([1, 1, 1] if white_background else [0, 0, 0])
        images = images * masks + (1 - masks) * bg

    depths = None
    if len(depth_paths) > 0:
        depths = np.stack([
            cv2.imread(p, cv2.IMREAD_UNCHANGED) for p in depth_paths
        ]) / 1000.0
        depths = depths * (1.0 / scale_mats[0][0, 0])
        depths[depths == 0] = -1.0
        if has_masks:
            depths[~(masks[..., 0] > 0)] = -1.0
        depths = depths.astype(np.float32)

    h, w = images.shape[1:3]
    KRT = intr[:, :3, :3] @ w2c_all
    n = images.shape[0]
    cam_infos, pc_xyz, pc_rgb = [], [], []
    for ci in range(n):
        w2c = w2c_all[ci]
        R, T = np.transpose(w2c[:3, :3]), w2c[:3, 3]
        K = intr[ci]
        fovy = focal2fov(K[1, 1], h)
        fovx = focal2fov(K[0, 0], w)
        name = Path(img_paths[ci]).stem
        fid = fid_value if fid_value is not None else int(name) / max(n - 1, 1)
        info = CameraInfo(
            uid=ci, R=R, T=T, FovY=fovy, FovX=fovx,
            image=images[ci].astype(np.float32),
            image_path=img_paths[ci], image_name=name, width=w, height=h,
            fid=fid,
            mask=masks[ci][..., 0].astype(np.float32) if has_masks else None,
            depth=depths[ci] if depths is not None else None,
            K=K, KRT=KRT[ci], pose=c2w[ci])
        cam_infos.append(info)
        if depths is not None:
            xyz, rgb = _depth_to_points(
                depths[ci], K, poses[ci], images[ci])
            pc_xyz.append(xyz)
            pc_rgb.append(rgb)

    all_pc = None
    if pc_xyz:
        all_pc = (np.concatenate(pc_xyz), np.concatenate(pc_rgb))
    return cam_infos, all_pc


def _depth_to_points(depth, K, pose, image):
    """Reference ``_gen_3dpoints`` (:1476-1491): normalized ray directions
    scaled by depth (note: depth is along the RAY, not z)."""
    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    p = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
    rays = p @ np.linalg.inv(K[:3, :3]).T
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rays_w = rays @ pose[:3, :3].T
    origin = pose[:3, 3]
    m = depth > 0
    pts = origin[None] + depth[m, None] * rays_w[m]
    return pts.astype(np.float32), image[m].astype(np.float32)


def visual_hull_samples(masks, KRT, n_pts=100_000, grid_resolution=256,
                        aabb=(-1.0, 1.0), seed=None):
    """Hull carving by nearest-mask sampling (reference :1385-1417)."""
    grid = np.linspace(aabb[0], aabb[1], grid_resolution)
    gx, gy, gz = np.meshgrid(grid, grid, grid)
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    keep = np.ones(pts.shape[0], bool)
    for ci in range(KRT.shape[0]):
        mask = masks[ci]
        if mask.ndim == 3:
            mask = mask[..., 0]
        h, w = mask.shape
        proj = (np.concatenate([pts, np.ones_like(pts[:, :1])], 1)
                @ KRT[ci].T)
        u = proj[:, 0] / proj[:, 2]
        v = proj[:, 1] / proj[:, 2]
        ui = np.clip(np.round(u).astype(int), 0, w - 1)
        vi = np.clip(np.round(v).astype(int), 0, h - 1)
        inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
        m = np.where(inb, mask[vi, ui] > 0, False)
        keep &= m
    out = pts[keep]
    rng = np.random.RandomState(seed) if seed is not None else np.random
    perm = rng.permutation(out.shape[0])
    return out[perm][:n_pts].astype(np.float32)


def read_neus_scene(path, white_background, train_cam_names, test_cam_names,
                    pred_cam_names, resfield=False, load_time_step=10000,
                    num_pts=100_000, pts_samples="random", seed=0):
    """ResFields/Owlii scene (reference ``readNeuSceneInfo``)."""
    rng = np.random.RandomState(seed)
    fid_value = 0 if load_time_step == 1 else None
    keep = (lambda f: f < load_time_step) if resfield else None

    def read_cams(names, keep_fid):
        infos, pcs = [], []
        for nm in names:
            ci, pc = read_cameras_from_neus(
                os.path.join(path, nm), white_background, keep_fid, fid_value)
            infos.extend(ci)
            if pc is not None:
                pcs.append(pc)
        all_pc = None
        if pcs:
            all_pc = (np.concatenate([p[0] for p in pcs]),
                      np.concatenate([p[1] for p in pcs]))
        return infos, all_pc

    if resfield:
        train_cam_infos, all_pc = read_cams(train_cam_names, keep)
        test_cam_infos, _ = read_cams(test_cam_names, keep)
        pred_cam_infos, _ = read_cams(pred_cam_names, None)
    else:
        train_cam_infos, all_pc = read_cameras_from_neus(
            path, white_background, None, fid_value)
        test_cam_infos, pred_cam_infos = [], []

    nerf_normalization = {"translate": np.zeros(3, np.float32), "radius": 1.0}

    if pts_samples == "vertices":
        vpath = os.path.join(path, "vertices.npz")
        data = np.load(vpath)
        seg = data["seg"] == 1.0
        xyz = data["vertices"][seg]
        colors = rng.random((xyz.shape[0], 3)) / 255.0
    elif pts_samples == "random":
        xyz = rng.random((num_pts, 3)) * 1.8 - 1.0  # [-1, 0.8) per reference
        colors = rng.random((num_pts, 3)) / 255.0
    elif pts_samples == "hull":
        aabb = (-1.0, 1.0)
        if all_pc is not None:
            aabb = (all_pc[0].min(), all_pc[0].max())
        frame0 = [c for c in train_cam_infos if c.fid == 0]
        KRT = np.stack([c.KRT for c in frame0])
        masks = np.stack([c.mask for c in frame0])
        xyz = visual_hull_samples(masks, KRT, n_pts=num_pts,
                                  grid_resolution=256, aabb=aabb, seed=seed)
        colors = rng.random((xyz.shape[0], 3)) / 255.0
    elif pts_samples == "depth":
        assert all_pc is not None
        xyz, colors = all_pc
        if xyz.shape[0] > num_pts:
            ind = rng.choice(xyz.shape[0], num_pts, replace=False)
            xyz, colors = xyz[ind], colors[ind]
    else:
        raise NotImplementedError(pts_samples)

    import tempfile, uuid
    ply_path = os.path.join(
        tempfile.gettempdir(), f"splatfields_init_{uuid.uuid4().hex}.ply")
    store_pointcloud(ply_path, xyz, colors)
    pcd = BasicPointCloud(points=xyz.astype(np.float32),
                          colors=colors.astype(np.float32),
                          normals=np.zeros_like(xyz, dtype=np.float32))
    return SceneInfo(
        point_cloud=pcd, train_cameras=train_cam_infos,
        test_cameras=test_cam_infos, pred_cameras=pred_cam_infos,
        nerf_normalization=nerf_normalization, ply_path=ply_path,
        extra={"penoptic": pts_samples == "vertices"})


def read_resfield_scene(path, white_background, train_cam_names,
                        test_cam_names, pred_cam_names, load_time_step=10000,
                        num_pts=100_000, pts_samples="random", **_):
    return read_neus_scene(
        path, white_background, train_cam_names, test_cam_names,
        pred_cam_names, resfield=True, load_time_step=load_time_step,
        num_pts=num_pts, pts_samples=pts_samples)


# ---------------------------------------------------------------------------
# DTU (NeuS cameras_sphere.npz static scans)
# ---------------------------------------------------------------------------

def read_dtu_cameras(path, render_camera="cameras_sphere.npz"):
    """reference ``readDTUCameras`` (:874-947) with the axis-flip chain."""
    import PIL.Image
    import imageio.v2 as imageio

    cam_dict = np.load(os.path.join(path, render_camera))
    images_lis = sorted(glob(os.path.join(path, "image/*.png")))
    masks_lis = sorted(glob(os.path.join(path, "mask/*.png")))
    n_images = len(images_lis)
    cam_infos = []
    for idx in range(n_images):
        image = np.array(PIL.Image.open(images_lis[idx]))
        mask = np.array(imageio.imread(masks_lis[idx])) / 255.0
        if mask.ndim == 2:
            mask = mask[..., None]
        image = (image * mask).astype(np.uint8)
        world_mat = cam_dict[f"world_mat_{idx}"].astype(np.float32)
        if f"fid_{idx}" in cam_dict:
            fid = cam_dict[f"fid_{idx}"] / (n_images / 12 - 1)
        else:
            fid = 0
        scale_mat = cam_dict[f"scale_mat_{idx}"].astype(np.float32)
        P = (world_mat @ scale_mat)[:3, :4]
        K, pose = load_k_rt_from_p(P)

        pose = np.concatenate([pose[0:1], -pose[2:3], -pose[1:2], pose[3:]], 0)
        S = np.eye(3)
        S[1, 1] = -1
        S[2, 2] = -1
        pose[1, 3] = -pose[1, 3]
        pose[2, 3] = -pose[2, 3]
        pose[:3, :3] = S @ pose[:3, :3] @ S
        pose = np.concatenate([pose[0:1], pose[2:3], pose[1:2], pose[3:]], 0)
        pose[:, 3] *= 0.5

        matrix = np.linalg.inv(pose)
        R = -np.transpose(matrix[:3, :3])
        R[:, 0] = -R[:, 0]
        T = -matrix[:3, 3]

        h, w = image.shape[:2]
        fovy = focal2fov(K[0, 0], h)
        fovx = focal2fov(K[0, 0], w)
        cam_infos.append(CameraInfo(
            uid=idx, R=R, T=T, FovY=fovy, FovX=fovx,
            image=image.astype(np.float32) / 255.0,
            image_path=images_lis[idx],
            image_name=Path(images_lis[idx]).stem, width=w, height=h,
            fid=fid, mask=mask[..., 0].astype(np.float32)))
    return cam_infos


def read_neus_dtu_scene(path, render_camera="cameras_sphere.npz",
                        num_pts=100_000, seed=0, **_):
    """reference ``readNeuSDTUInfo`` (:950-990): random cube init."""
    from splatfields_tpu.data.readers.blender import nerfpp_norm_from_infos
    train_cam_infos = read_dtu_cameras(path, render_camera)
    nerf_normalization = nerfpp_norm_from_infos(train_cam_infos)
    rng = np.random.RandomState(seed)
    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        from splatfields_tpu.ops.sh import sh_to_rgb
        import jax.numpy as jnp
        colors = np.asarray(sh_to_rgb(jnp.asarray(shs)))
        store_pointcloud(ply_path, xyz.astype(np.float32), colors)
    from splatfields_tpu.data.ply import fetch_pointcloud
    p, c, nrm = fetch_pointcloud(ply_path)
    pcd = BasicPointCloud(points=p, colors=c, normals=nrm)
    return SceneInfo(
        point_cloud=pcd, train_cameras=train_cam_infos, test_cameras=[],
        pred_cameras=[], nerf_normalization=nerf_normalization,
        ply_path=ply_path)
