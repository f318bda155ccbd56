"""Scene orchestration: dataset loading, camera staging, splat init.

Parity target: reference ``scene/__init__.py`` (``Scene``): marker-file
dataset sniffing, ``input.ply`` + ``cameras.json`` persistence, camera
shuffling, ``cameras_extent`` from the NeRF++ normalization radius,
resolution-scaled camera lists, create-from-pcd or load-from-iteration.
"""
from __future__ import annotations

import json
import os
import random
import shutil

import numpy as np

from splatfields_tpu.data.cameras import camera_list_from_cam_infos, camera_to_json
from splatfields_tpu.data.registry import SCENE_LOADERS, sniff_scene_type
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.utils.system import search_for_max_iteration


class Scene:
    def __init__(self, cfg, load_iteration=None, shuffle=True,
                 resolution_scales=(1.0,), capacity_multiplier: float = 1.0):
        """cfg is a ModelConfig (see config.py) mirroring ModelParams."""
        self.model_path = cfg.model_path
        self.loaded_iter = None

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        scene_type = sniff_scene_type(cfg.source_path)
        loader = SCENE_LOADERS[scene_type]
        kwargs = dict(
            white_background=cfg.white_background,
            load_time_step=cfg.load_time_step,
            num_pts=cfg.num_pts,
            pts_samples=cfg.pts_samples,
        )
        if scene_type == "Colmap":
            scene_info = loader(
                cfg.source_path, images=cfg.images, eval_mode=cfg.eval,
                white_background=cfg.white_background, pc_path=cfg.pc_path,
                n_views=cfg.n_views, num_pts=cfg.max_num_pts)
        elif scene_type == "Blender_cv":
            scene_info = loader(
                cfg.source_path, cfg.white_background, cfg.eval,
                load_time_step=cfg.load_time_step, n_views=cfg.n_views,
                num_pts=cfg.num_pts, max_num_pts=cfg.max_num_pts,
                pts_samples=cfg.pts_samples, pc_path=cfg.pc_path)
        elif scene_type == "DTU":
            scene_info = loader(cfg.source_path, num_pts=cfg.num_pts)
        elif scene_type == "nerfies":
            scene_info = loader(
                cfg.source_path, eval_mode=cfg.eval,
                load_time_step=cfg.load_time_step,
                max_pts=cfg.max_num_pts if cfg.max_num_pts > 0 else 300_000)
        else:  # ResFields
            scene_info = loader(
                cfg.source_path, cfg.white_background,
                train_cam_names=cfg.train_cam_names,
                test_cam_names=cfg.test_cam_names,
                pred_cam_names=cfg.pred_cam_names,
                load_time_step=cfg.load_time_step, num_pts=cfg.num_pts,
                pts_samples=cfg.pts_samples)
        self.scene_info = scene_info
        self.scene_type = scene_type

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            if os.path.exists(scene_info.ply_path):
                shutil.copyfile(scene_info.ply_path,
                                os.path.join(self.model_path, "input.ply"))
            cam_json = []
            for idx, cam in enumerate(
                    scene_info.test_cameras + scene_info.train_cameras):
                cam_json.append(camera_to_json(idx, cam))
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent = float(scene_info.nerf_normalization["radius"])

        self.train_cameras = {}
        self.test_cameras = {}
        self.pred_cameras = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = camera_list_from_cam_infos(
                scene_info.train_cameras, scale, cfg.resolution)
            self.test_cameras[scale] = camera_list_from_cam_infos(
                scene_info.test_cameras, scale, cfg.resolution)
            self.pred_cameras[scale] = camera_list_from_cam_infos(
                scene_info.pred_cameras, scale, cfg.resolution)

        # splat init
        n0 = scene_info.point_cloud.points.shape[0]
        capacity = max(int(n0 * capacity_multiplier), n0)
        if self.loaded_iter:
            ply = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{self.loaded_iter}",
                               "point_cloud.ply")
            self.splats, self.splat_stats, self.loaded_sh_degree = (
                splats_lib.load_ply(ply, isotropic=getattr(
                    cfg, "use_isotropic", False)))
        else:
            self.splats, self.splat_stats = splats_lib.create_from_pcd(
                scene_info.point_cloud.points, scene_info.point_cloud.colors,
                cfg.sh_degree, capacity=capacity,
                isotropic=getattr(cfg, "use_isotropic", False))
            self.loaded_sh_degree = None

    def get_train_cameras(self, scale=1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale=1.0):
        return self.test_cameras[scale]

    def get_pred_cameras(self, scale=1.0):
        return self.pred_cameras[scale]

    def save(self, iteration, params, stats, overwrite_attributes=None,
             vis_geometric=False):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
        splats_lib.save_ply(path, params, np.asarray(stats.valid),
                            overwrite=overwrite_attributes,
                            vis_geometric=vis_geometric)
