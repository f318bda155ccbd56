"""End-to-end training integration tests on a synthetic Blender-format
dataset: build a tiny scene on disk, render ground truth with the tile
rasterizer from a known splat set, then check the full training loop
(reader -> Scene -> jitted step -> densify -> save) reduces loss.
"""
import json
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatfields_tpu import config as cfg_lib
from splatfields_tpu.models import splats as splats_lib


def _make_pose(theta, phi, radius):
    # camera on a sphere looking at origin, blender (OpenGL) convention c2w
    cx = radius * math.cos(phi) * math.sin(theta)
    cy = radius * math.cos(phi) * math.cos(theta)
    cz = radius * math.sin(phi)
    pos = np.array([cx, cy, cz])
    forward = pos / np.linalg.norm(pos)  # blender cam looks along -z
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = pos
    return c2w


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    """Synthetic 'lego' dataset: 64x64, 5 train + 2 test views."""
    import PIL.Image
    from splatfields_tpu.data.readers.blender import (
        read_cameras_from_transforms_cv)
    from splatfields_tpu.data.cameras import load_cam
    from splatfields_tpu.ops.raster.api import rasterize

    root = tmp_path_factory.mktemp("data") / "lego"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    res = 64
    fov = 0.8

    def write_transforms(name, thetas):
        frames = []
        for i, th in enumerate(thetas):
            frames.append({
                "file_path": f"./{name}/r_{i}",
                "transform_matrix": _make_pose(th, 0.5, 4.0).tolist(),
            })
        with open(root / f"transforms_{name}.json", "w") as f:
            json.dump({"camera_angle_x": fov, "frames": frames}, f)

    write_transforms("train", np.linspace(0, 2 * np.pi, 5, endpoint=False))
    write_transforms("test", [0.3, 2.5])
    # placeholder images so the reader can load
    blank = PIL.Image.fromarray(np.zeros((res, res, 4), np.uint8))
    for i in range(5):
        blank.save(root / "train" / f"r_{i}.png")
    for i in range(2):
        blank.save(root / "test" / f"r_{i}.png")

    # ground-truth splats
    rng = np.random.RandomState(0)
    n = 300
    gt_means = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    gt_scales = (0.03 + 0.04 * rng.rand(n, 3)).astype(np.float32)
    gt_rots = rng.randn(n, 4).astype(np.float32)
    gt_ops = rng.uniform(0.5, 0.95, n).astype(np.float32)
    gt_cols = rng.rand(n, 3).astype(np.float32)

    # render GT through loaded cameras and write the real images
    for split, count in (("train", 5), ("test", 2)):
        infos, _ = read_cameras_from_transforms_cv(
            str(root), f"transforms_{split}.json", True)
        for i, info in enumerate(infos):
            cam = load_cam(info, -1, i, 1.0, max_resolution=res)
            out = rasterize(
                jnp.asarray(gt_means), jnp.asarray(gt_scales),
                jnp.asarray(gt_rots), jnp.asarray(gt_ops),
                jnp.asarray(cam.world_view_transform),
                jnp.asarray(cam.full_proj_transform),
                jnp.asarray(cam.camera_center),
                jnp.asarray(np.ones(3, np.float32)),
                cam.tanfovx, cam.tanfovy, cam.image_width, cam.image_height,
                colors_precomp=jnp.asarray(gt_cols),
                tile_cap=256, k_chunk=64)
            rgb = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
            alpha = np.clip(np.asarray(out.alpha)[0], 0, 1)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            PIL.Image.fromarray((rgba * 255).astype(np.uint8)).save(
                root / split / f"r_{i}.png")
    return str(root)


def base_args(root, model_path, extra=()):
    parser = cfg_lib.build_parser()
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    argv = ["-s", root, "-m", model_path, "--white_background", "--eval",
            "--n_views", "4", "--pts_samples", "hull", "--num_pts", "2000",
            "--load_time_step", "0", "--composition_rank", "0",
            "--tile_cap", "128", "--k_chunk", "32",
            ] + list(extra)
    return parser.parse_args(argv)


class TestStaticTraining:
    def test_loss_decreases_and_saves(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training

        args = base_args(blender_scene, str(tmp_path / "run"),
                         ["--is_static", "--iterations", "60"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 60
        opt_cfg.densify_from_iter = 10_000  # no densify in this short run
        losses = []
        params, stats, deform, _ = training(
            model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
            test_iterations=[], save_iterations=[60], args=args, quiet=True,
            progress_callback=lambda it, loss, p, s: losses.append(loss))
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
        # checkpoint written
        ply = os.path.join(model_cfg.model_path,
                           "point_cloud/iteration_60/point_cloud.ply")
        assert os.path.exists(ply)
        p2, s2, deg = splats_lib.load_ply(ply)
        assert int(s2.valid.sum()) == int(stats.valid.sum())

    def test_densification_runs(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training

        args = base_args(blender_scene, str(tmp_path / "run2"),
                         ["--is_static", "--iterations", "40",
                          "--num_pts", "500"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 40
        opt_cfg.densify_from_iter = 5
        opt_cfg.densification_interval = 10
        opt_cfg.densify_grad_threshold = 1e-8  # force clones/splits
        counts = []
        params, stats, _, _ = training(
            model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
            test_iterations=[], save_iterations=[], args=args, quiet=True,
            progress_callback=lambda it, loss, p, s: counts.append(
                int(np.asarray(s.valid).sum())))
        assert counts[-1] != counts[0]  # splat count changed


class TestScanK:
    def test_scan_k_matches_sequential(self, blender_scene, tmp_path):
        """--scan_k N (k iterations per dispatch via lax.scan) must
        reproduce the unscanned loop exactly: same batches (host RNG
        seeded), same per-step LR schedule, same densify decisions —
        windows crossing a densify boundary fall back to single steps."""
        import random
        from splatfields_tpu.train import training

        def run(tag, scan_k):
            random.seed(7)
            args = base_args(blender_scene, str(tmp_path / tag),
                             ["--is_static", "--iterations", "25",
                              "--num_pts", "400"])
            (model_cfg, pipe_cfg, hidden_cfg,
             opt_cfg) = cfg_lib.extract_configs(args)
            opt_cfg.iterations = 25
            opt_cfg.densify_from_iter = 5
            opt_cfg.densification_interval = 10
            opt_cfg.densify_grad_threshold = 1e-8  # force a densify
            # headroom so neither run hits the dup-budget growth path:
            # sequential grows it mid-window (after 1 step), scanned only
            # at the window boundary — a legitimate 3-step divergence that
            # would confound the equality check
            pipe_cfg.dup_factor = 16
            params, stats, _, _ = training(
                model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                test_iterations=[], save_iterations=[], args=args,
                quiet=True, scan_k=scan_k)
            return params, stats

        p0, s0 = run("seq", 0)
        p1, s1 = run("scan", 4)
        assert int(np.asarray(s0.valid).sum()) == int(np.asarray(s1.valid).sum())
        np.testing.assert_allclose(np.asarray(p1.xyz), np.asarray(p0.xyz),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p1.opacity), np.asarray(p0.opacity),
            rtol=1e-5, atol=1e-6)


class TestFieldTraining:
    def test_field_mode_smoke(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training

        args = base_args(
            blender_scene, str(tmp_path / "run3"),
            ["--iterations", "30", "--encoder_type", "none",
             "--num_pts", "500", "--lambda_norm", "0.01"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 30
        opt_cfg.densify_from_iter = 10_000
        losses = []
        params, stats, deform, _ = training(
            model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
            test_iterations=[], save_iterations=[30], args=args, quiet=True,
            progress_callback=lambda it, loss, p, s: losses.append(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # field checkpoint written and reloadable
        deform.load_weights(model_cfg.model_path, 30)

    def test_field_mode_triplane_smoke(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training

        args = base_args(
            blender_scene, str(tmp_path / "run4"),
            ["--iterations", "8", "--encoder_type", "VarTriPlaneEncoder",
             "--num_pts", "300"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        hidden_cfg.encoder_args = {"noise_res": 4}
        opt_cfg.iterations = 8
        opt_cfg.densify_from_iter = 10_000
        losses = []
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[], args=args,
                 quiet=True,
                 progress_callback=lambda it, loss, p, s: losses.append(loss))
        assert np.isfinite(losses).all()

    def test_field_mode_ngp_smoke(self, blender_scene, tmp_path):
        """BASELINE config 5 through the train CLI: HashGrid+MLP backbone
        (--encoder_type NGPMLP, reference scene/ngpFields.py)."""
        from splatfields_tpu.train import training

        args = base_args(
            blender_scene, str(tmp_path / "run4n"),
            ["--iterations", "8", "--encoder_type", "NGPMLP",
             "--num_pts", "300"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        hidden_cfg.encoder_args = {
            "n_levels": 4, "log2_hashmap_size": 10}  # CPU-sized table
        opt_cfg.iterations = 8
        opt_cfg.densify_from_iter = 10_000
        losses = []
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[], args=args,
                 quiet=True,
                 progress_callback=lambda it, loss, p, s: losses.append(loss))
        assert np.isfinite(losses).all()


class TestMeshTraining:
    def test_static_training_on_device_mesh(self, blender_scene, tmp_path):
        """Full training loop on a ('data','model') mesh (train CLI's
        --mesh_model path): sharded step + densify with shard/unshard +
        capacity growth rounded to the model axis."""
        from splatfields_tpu.train import training
        from splatfields_tpu.parallel.mesh import make_mesh

        args = base_args(blender_scene, str(tmp_path / "mesh_run"),
                         ["--is_static", "--iterations", "30",
                          "--num_pts", "500"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 30
        opt_cfg.densify_from_iter = 5
        opt_cfg.densification_interval = 10
        opt_cfg.densify_grad_threshold = 1e-8  # force clones/splits
        mesh = make_mesh(4, data=1)
        losses, counts = [], []
        params, stats, _, _ = training(
            model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
            test_iterations=[], save_iterations=[30], args=args, quiet=True,
            progress_callback=lambda it, loss, p, s: (
                losses.append(loss),
                counts.append(int(np.asarray(s.valid).sum()))),
            mesh=mesh)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (losses[0], losses[-1])
        assert counts[-1] != counts[0]          # densify ran on the mesh
        assert params.capacity % 4 == 0          # rounded to model axis
        ply = os.path.join(model_cfg.model_path,
                           "point_cloud/iteration_30/point_cloud.ply")
        assert os.path.exists(ply)


class TestResumeAndRender:
    def test_resume_continues(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training

        mp = str(tmp_path / "resume_run")
        args = base_args(blender_scene, mp,
                         ["--is_static", "--iterations", "20",
                          "--num_pts", "400"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 10
        opt_cfg.densify_from_iter = 10_000
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[10], args=args,
                 quiet=True)
        assert os.path.exists(os.path.join(mp, "train_state/iteration_10"))
        # resume to 20
        opt_cfg.iterations = 20
        seen = []
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[20], args=args,
                 quiet=True, resume=True,
                 progress_callback=lambda it, loss, p, s: seen.append(it))
        assert seen[0] == 11 and seen[-1] == 20

    def test_render_cli_end_to_end(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training
        from splatfields_tpu.render import render_sets

        mp = str(tmp_path / "render_run")
        args = base_args(blender_scene, mp,
                         ["--is_static", "--iterations", "15",
                          "--num_pts", "400"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 15
        opt_cfg.densify_from_iter = 10_000
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[15], args=args,
                 quiet=True)
        results = render_sets(model_cfg, hidden_cfg, pipe_cfg, 15,
                              skip_train=True)
        assert "test" in results and "psnr" in results["test"]
        out = os.path.join(mp, "test/ours_15")
        assert os.path.exists(os.path.join(out, "results.yaml"))
        assert os.path.exists(os.path.join(out, "renders/00000.png"))
        # video artifact: mp4 when an ffmpeg backend exists, else the
        # animated-GIF fallback — one of them must always be written
        assert (os.path.exists(os.path.join(out, "video.mp4"))
                or os.path.exists(os.path.join(out, "video.gif")))

    def test_extract_geo_cli(self, blender_scene, tmp_path):
        from splatfields_tpu.train import training
        from splatfields_tpu.extract_geo import morans_report
        from splatfields_tpu.scene import Scene

        mp = str(tmp_path / "geo_run")
        args = base_args(blender_scene, mp,
                         ["--is_static", "--iterations", "5",
                          "--num_pts", "300"])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 5
        opt_cfg.densify_from_iter = 10_000
        training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
                 test_iterations=[], save_iterations=[5], args=args,
                 quiet=True)
        scene = Scene(model_cfg, load_iteration=5, shuffle=False)
        rep = morans_report(scene.splats, scene.splat_stats, None, 0)
        assert "moran_scale" in rep
        assert np.isfinite(list(rep.values())).all()

        # mesh extraction (--mesh_resolution): density iso-surface via
        # marching tetrahedra over the trained splats
        from splatfields_tpu.extract_geo import splat_density_query
        from splatfields_tpu.ops.marching import extract_geometry
        valid = np.asarray(scene.splat_stats.valid)
        xyz = np.asarray(scene.splats.xyz)[valid]
        query = splat_density_query(scene.splats, scene.splat_stats,
                                    None, 0)
        verts, tris = extract_geometry(
            xyz.min(0) - 0.1, xyz.max(0) + 0.1, 24, 0.3, query)
        assert len(verts) > 0 and len(tris) > 0
        assert np.isfinite(verts).all()
        assert verts.min() >= xyz.min() - 0.11
        assert verts.max() <= xyz.max() + 0.11


@pytest.fixture(scope="module")
def dynamic_scene(tmp_path_factory):
    """Synthetic 3-frame dynamic dataset (Owlii-style time conditioning in
    Blender format): GT splats translate over time."""
    import PIL.Image
    from splatfields_tpu.data.readers.blender import (
        read_cameras_from_transforms_cv)
    from splatfields_tpu.data.cameras import load_cam
    from splatfields_tpu.ops.raster.api import rasterize

    root = tmp_path_factory.mktemp("dyn") / "lego"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    res = 48
    fov = 0.8
    n_frames = 3

    def frames_for(split, thetas):
        out = []
        i = 0
        for t in range(n_frames):
            for th in thetas:
                out.append({
                    "file_path": f"./{split}/r_{i}",
                    "time": t / (n_frames - 1),
                    "transform_matrix": _make_pose(th, 0.5, 4.0).tolist(),
                })
                i += 1
        return out

    for split, thetas in (("train", [0.0, 2.1, 4.2]), ("test", [1.0])):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": fov,
                       "frames": frames_for(split, thetas)}, f)
        blank = __import__("PIL.Image", fromlist=["Image"]).fromarray(
            np.zeros((res, res, 4), np.uint8))
        for i in range(len(thetas) * n_frames):
            blank.save(root / split / f"r_{i}.png")

    rng = np.random.RandomState(3)
    n = 200
    base = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    scales = (0.04 + 0.04 * rng.rand(n, 3)).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    ops = rng.uniform(0.5, 0.95, n).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)

    for split in ("train", "test"):
        infos, _ = read_cameras_from_transforms_cv(
            str(root), f"transforms_{split}.json", True)
        for i, info in enumerate(infos):
            cam = load_cam(info, -1, i, 1.0, max_resolution=res)
            shift = np.array([0.25 * cam.fid, 0.0, 0.0], np.float32)
            out = rasterize(
                jnp.asarray(base + shift), jnp.asarray(scales),
                jnp.asarray(rots), jnp.asarray(ops),
                jnp.asarray(cam.world_view_transform),
                jnp.asarray(cam.full_proj_transform),
                jnp.asarray(cam.camera_center),
                jnp.asarray(np.ones(3, np.float32)),
                cam.tanfovx, cam.tanfovy, cam.image_width, cam.image_height,
                colors_precomp=jnp.asarray(cols), tile_cap=256, k_chunk=64)
            rgb = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
            alpha = np.clip(np.asarray(out.alpha)[0], 0, 1)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            __import__("PIL.Image", fromlist=["Image"]).fromarray(
                (rgba * 255).astype(np.uint8)).save(
                root / split / f"r_{i}.png")
    return str(root)


class TestDynamicTraining:
    def test_4d_field_with_resfields_and_flow(self, dynamic_scene, tmp_path):
        """Dynamic (n_frames=3) training: time embedding + ResFields rank +
        offset flow head through the full loop (Owlii-protocol shape)."""
        from splatfields_tpu.train import training

        parser = cfg_lib.build_parser()
        parser.add_argument("--test_iterations", nargs="+", type=int,
                            default=[])
        parser.add_argument("--save_iterations", nargs="+", type=int,
                            default=[])
        args = parser.parse_args([
            "-s", dynamic_scene, "-m", str(tmp_path / "dyn_run"),
            "--white_background", "--eval", "--load_time_step", "3",
            "--flow_model", "offset", "--all_training",
            "--encoder_type", "none", "--num_pts", "300",
            "--composition_rank", "2", "--n_views", "9",
            "--pts_samples", "hull", "--tile_cap", "128", "--k_chunk", "32",
            "--iterations", "12",
        ])
        model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
        opt_cfg.iterations = 12
        opt_cfg.num_views = 2
        opt_cfg.densify_from_iter = 10_000
        losses = []
        params, stats, deform, _ = training(
            model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
            test_iterations=[], save_iterations=[12], args=args, quiet=True,
            progress_callback=lambda it, loss, p, s: losses.append(loss))
        assert np.isfinite(losses).all()
        assert deform.n_frames == 3
        # the field net has temporal ResField params
        flat = jax.tree_util.tree_flatten_with_path(
            deform.variables["params"])[0]
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert any("weights_t" in n for n in names)
        # different fids give different splat positions (flow active)
        xyz = jnp.asarray(np.asarray(params.xyz)[np.asarray(stats.valid)])
        t0 = jnp.zeros((xyz.shape[0], 1))
        t1 = jnp.ones((xyz.shape[0], 1))
        r0 = deform.net.apply(deform.variables, xyz, t0)
        r1 = deform.net.apply(deform.variables, xyz, t1)
        assert np.abs(np.asarray(r0["means3D"])
                      - np.asarray(r1["means3D"])).max() > 1e-5
