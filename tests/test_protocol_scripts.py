"""NeuS-format readers (DTU + ResFields/Owlii) and the protocol scripts.

Covers VERDICT round-1 item 7's "Done" criterion: run_dtu.sh and
run_owlii.sh execute end-to-end against synthetic fixtures (iteration
counts overridden via the scripts' env knobs; every protocol flag
otherwise identical to the reference scripts).

Fixture construction mirrors the NeuS convention the readers parse
(reference ``scene/dataset_readers.py:874-990,1287-1690``):
``cameras_sphere.npz`` holding ``world_mat_i = K4 @ w2c4`` and
``scale_mat_i``, plus image/ and mask/ PNG dirs; ResFields scenes are one
such directory per camera with one entry per FRAME. GT images are
rendered from a known splat set through the reader-loaded cameras, so
training genuinely fits them.
"""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_png(path, arr):
    import PIL.Image
    PIL.Image.fromarray(arr).save(path)


def _camera_npz_entry(theta, radius=4.0, res=48, focal=55.0):
    """One camera: K and a w2c looking at the origin from angle theta."""
    c, s = np.cos(theta), np.sin(theta)
    # camera center on a circle, looking at origin (z forward)
    center = np.array([radius * s, 0.35, radius * c], np.float32)
    fwd = -center / np.linalg.norm(center)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R_c2w = np.stack([right, up2, fwd], axis=1)  # columns
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R_c2w.T
    w2c[:3, 3] = -R_c2w.T @ center
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = focal
    K4[0, 2] = K4[1, 2] = res / 2.0
    world_mat = (K4 @ w2c).astype(np.float32)
    return world_mat


def _gt_splats(seed=5, n=250):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    scales = (0.05 + 0.05 * rng.rand(n, 3)).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    ops = rng.uniform(0.6, 0.95, n).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return base, scales, rots, ops, cols


def _render_through_reader(cam_info, splats, shift=None):
    from splatfields_tpu.data.cameras import load_cam
    from splatfields_tpu.ops.raster.api import rasterize

    base, scales, rots, ops, cols = splats
    if shift is not None:
        base = base + shift
    cam = load_cam(cam_info, -1, 0, 1.0, max_resolution=4096)
    out = rasterize(
        jnp.asarray(base), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(ops), jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), jnp.asarray(cam.camera_center),
        jnp.asarray(np.zeros(3, np.float32)),
        cam.tanfovx, cam.tanfovy, cam.image_width, cam.image_height,
        colors_precomp=jnp.asarray(cols), tile_cap=256, k_chunk=64,
        blend_impl="jax")
    rgb = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
    alpha = np.clip(np.asarray(out.alpha)[0], 0, 1)
    return rgb, alpha


def _fill_dir(cam_dir, entries, splats, res, shifts=None):
    """entries: list of world_mat (one per frame/image index)."""
    from splatfields_tpu.data.readers.neus import read_cameras_from_neus

    os.makedirs(os.path.join(cam_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(cam_dir, "mask"), exist_ok=True)
    npz = {}
    for i, wm in enumerate(entries):
        npz[f"world_mat_{i}"] = wm
        npz[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        _write_png(os.path.join(cam_dir, "image", f"{i:03d}.png"),
                   np.zeros((res, res, 3), np.uint8))
        _write_png(os.path.join(cam_dir, "mask", f"{i:03d}.png"),
                   np.full((res, res, 3), 255, np.uint8))
    np.savez(os.path.join(cam_dir, "cameras_sphere.npz"), **npz)

    # render GT through the reader's own camera interpretation
    infos, _ = read_cameras_from_neus(cam_dir, False)
    for i, info in enumerate(infos):
        shift = shifts[i] if shifts is not None else None
        rgb, alpha = _render_through_reader(info, splats, shift)
        _write_png(os.path.join(cam_dir, "image", f"{i:03d}.png"),
                   (rgb * 255).astype(np.uint8))
        _write_png(os.path.join(cam_dir, "mask", f"{i:03d}.png"),
                   np.repeat((alpha > 0.2)[..., None], 3, -1).astype(
                       np.uint8) * 255)


@pytest.fixture(scope="module")
def dtu_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu") / "scan_t"
    root.mkdir()
    res = 48
    splats = _gt_splats()
    entries = [_camera_npz_entry(th, res=res)
               for th in (0.0, 0.9, 1.8, 2.7, 3.6, 4.5)]
    _fill_dir(str(root), entries, splats, res)
    return str(root)


@pytest.fixture(scope="module")
def owlii_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("owlii") / "dancer_t"
    root.mkdir()
    res = 48
    n_frames = 2
    splats = _gt_splats()
    for c in range(10):
        th = 0.63 * c
        shifts = [np.array([0.2 * f / max(n_frames - 1, 1), 0, 0],
                           np.float32) for f in range(n_frames)]
        _fill_dir(str(root / f"cam_train_{c}"),
                  [_camera_npz_entry(th, res=res)] * n_frames,
                  splats, res, shifts=shifts)
    _fill_dir(str(root / "cam_test"),
              [_camera_npz_entry(3.0, res=res)] * n_frames, splats, res,
              shifts=[np.array([0.2 * f / max(n_frames - 1, 1), 0, 0],
                               np.float32) for f in range(n_frames)])
    return str(root)


class TestNeusReaders:
    def test_dtu_reader_and_registry(self, dtu_scene):
        from splatfields_tpu.data.readers.neus import read_neus_dtu_scene
        from splatfields_tpu.data.registry import sniff_scene_type

        assert sniff_scene_type(dtu_scene) == "DTU"
        info = read_neus_dtu_scene(dtu_scene, num_pts=500)
        assert len(info.train_cameras) == 6
        cam = info.train_cameras[0]
        assert cam.image.shape == (48, 48, 3)
        assert cam.mask is not None and cam.mask.shape == (48, 48)
        assert 0.02 < float(cam.mask.mean()) < 0.9  # object visible, not full-frame
        assert info.point_cloud.points.shape == (500, 3)
        assert np.isfinite(info.nerf_normalization["radius"])

    def test_resfield_reader_hull(self, owlii_scene):
        from splatfields_tpu.data.readers.neus import read_resfield_scene

        info = read_resfield_scene(
            owlii_scene, True,
            [f"cam_train_{i}" for i in range(10)], ["cam_test"],
            ["cam_test"], load_time_step=2, num_pts=400,
            pts_samples="hull")
        assert len(info.train_cameras) == 20   # 10 cams x 2 frames
        assert len(info.test_cameras) == 2
        fids = sorted({c.fid for c in info.train_cameras})
        assert fids == [0.0, 1.0]
        pts = info.point_cloud.points
        assert pts.shape[0] > 100
        # hull points must lie inside every frame-0 mask's unit region
        assert np.abs(pts).max() <= 1.0


def _run_script(script, env_overrides, timeout=1500):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let conftest's CPU forcing not leak
    env.update(env_overrides)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc


@pytest.mark.slow
class TestProtocolScripts:
    def test_run_dtu_smoke(self, dtu_scene, tmp_path):
        out = tmp_path / "out_dtu"
        _run_script("run_dtu.sh", {
            "DATASET_ROOT": os.path.dirname(dtu_scene),
            "SCENE": os.path.basename(dtu_scene),
            "OUT": str(out),
            "N_VIEWS": "3", "ITERS": "30", "PC_ITER": "30",
            "MAX_PTS": "400",
            "JAX_PLATFORMS": "cpu",
        })
        scene = os.path.basename(dtu_scene)
        assert (out / scene / "3views" / "3DGS" / "point_cloud" /
                "iteration_30" / "point_cloud.ply").exists()
        assert (out / scene / "3views" / "SplatFields3D" / "point_cloud" /
                "iteration_30" / "point_cloud.ply").exists()

    def test_run_owlii_smoke(self, owlii_scene, tmp_path):
        out = tmp_path / "out_owlii"
        _run_script("run_owlii.sh", {
            "DATASET_ROOT": os.path.dirname(owlii_scene),
            "SCENE": os.path.basename(owlii_scene),
            "OUT": str(out),
            "ITERS": "30", "TIME_STEP": "2", "NUM_PTS": "300",
            "NUM_VIEWS": "2", "RANK": "2",
            "JAX_PLATFORMS": "cpu",
        })
        scene_out = (out / "8views" / os.path.basename(owlii_scene)
                     / "SplatFields4D")
        assert (scene_out / "point_cloud" / "iteration_30"
                / "point_cloud.ply").exists()
        assert (scene_out / "deform" / "iteration_30" / "deform.ckpt"
                ).exists() or any((scene_out / "deform").glob("*"))
