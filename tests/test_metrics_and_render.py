"""Metrics parity tests (vs the reference's torch/scipy implementation
re-run as an oracle) and render CLI smoke tests."""
import math
import os

import numpy as np
import pytest
import torch
from scipy import signal

from splatfields_tpu import metrics


def _reference_ssim(img0, img1, mask=None):
    """The reference's compute_ssim (render.py:45-160), pasted semantics via
    torch+scipy as the oracle."""
    img0 = torch.as_tensor(img0)
    img1 = torch.as_tensor(img1)
    if mask is None:
        mask = torch.ones_like(img0[..., :1])
    else:
        mask = torch.as_tensor(mask)
    mask = mask[..., 0]
    filter_size, filter_sigma = 11, 1.5
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((torch.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = torch.exp(-0.5 * f_i)
    filt /= torch.sum(filt)

    def convolve2d(z, m, f):
        z_ = []
        for i in range(3):
            z_.append(torch.as_tensor(
                signal.convolve2d(z[..., i] * m, f, mode="valid")))
        z_ = torch.stack(z_, axis=-1)
        m_ = torch.as_tensor(
            signal.convolve2d(m, torch.ones_like(f), mode="valid"))
        ret = []
        for i in range(3):
            ret.append(torch.where(m_ != 0,
                                   z_[..., i] * torch.ones_like(f).sum() / m_,
                                   torch.tensor(0.0)))
        return torch.stack(ret, axis=-1), (m_ != 0).type(z.dtype)

    f1 = lambda z, m: convolve2d(z, m, filt[:, None])
    f2 = lambda z, m: convolve2d(z, m, filt[None, :])
    filt_fn = lambda z, m: f1(*f2(z, m))
    mu0 = filt_fn(img0, mask)[0]
    mu1 = filt_fn(img1, mask)[0]
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = filt_fn(img0**2, mask)[0] - mu00
    s11 = filt_fn(img1**2, mask)[0] - mu11
    s01 = filt_fn(img0 * img1, mask)[0] - mu01
    s00 = torch.maximum(torch.tensor(0.0), s00)
    s11 = torch.maximum(torch.tensor(0.0), s11)
    s01 = torch.sign(s01) * torch.minimum(torch.sqrt(s00 * s11),
                                          torch.abs(s01))
    c1, c2 = 0.01**2, 0.03**2
    numer = (2 * mu01 + c1) * (2 * s01 + c2)
    denom = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return float((numer / denom).mean())


class TestMetrics:
    def test_psnr_formula(self):
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 0.5, np.float32)
        assert abs(metrics.compute_psnr(a, b)
                   - (-10 / math.log(10) * math.log(0.25))) < 1e-5

    def test_ssim_matches_reference(self):
        rng = np.random.RandomState(0)
        a = rng.rand(40, 32, 3).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(40, 32, 3).astype(np.float32), 0, 1)
        ours = metrics.compute_ssim(a, b)
        oracle = _reference_ssim(a, b)
        assert abs(ours - oracle) < 1e-5

    def test_masked_ssim_matches_reference(self):
        rng = np.random.RandomState(1)
        a = rng.rand(40, 32, 3).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(40, 32, 3).astype(np.float32), 0, 1)
        mask = (rng.rand(40, 32, 1) > 0.4).astype(np.float32)
        ours = metrics.compute_ssim(a, b, mask)
        oracle = _reference_ssim(a, b, mask)
        assert abs(ours - oracle) < 1e-5

    def test_eval_all_writes_results(self, tmp_path):
        import cv2
        rng = np.random.RandomState(2)
        os.makedirs(tmp_path / "gt")
        os.makedirs(tmp_path / "renders")
        for i in range(3):
            img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            noisy = np.clip(img + rng.randn(32, 32, 3) * 10, 0, 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / "gt" / f"{i:05d}.png"), img)
            cv2.imwrite(str(tmp_path / "renders" / f"{i:05d}.png"), noisy)
        summary = metrics.eval_all(str(tmp_path))
        assert "psnr" in summary and "ssim" in summary
        assert os.path.exists(tmp_path / "results.yaml")
        txt = open(tmp_path / "results.yaml").read()
        assert "psnr" in txt and "lpips" in txt


class TestShardedStep:
    """The sharded step must be a 1:1 replacement for
    train_lib.make_train_step: same loss, same updated splat AND field
    params, same densification stats (VERDICT round-1 item 3). Views carry
    DIFFERENT images and cameras so a broken 'data' reduction cannot pass."""

    W = H = 32
    V = 2

    @classmethod
    def _setup(cls, field_mode=True, sh_degree=0, n_frames=0):
        import jax.numpy as jnp
        from splatfields_tpu import config as cfg_lib
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.models.deform_model import DeformModel
        from splatfields_tpu.utils import camera_math as cm
        import __graft_entry__ as ge

        s = ge._tiny_scene(n=128, width=cls.W, height=cls.H)
        params, stats = splats_lib.create_from_pcd(
            s["means"], np.abs(s["means"]), sh_degree, capacity=128)
        splat_opt = splats_lib.adam_init(params)
        deform = None
        if field_mode:
            hidden = cfg_lib.HiddenConfig(
                encoder_type="none",
                composition_rank=4 if n_frames else 0,
                n_frames=n_frames, flow_model="offset")
            deform = DeformModel(hidden, radius=1.0)
        opt_cfg = cfg_lib.OptimizationConfig(
            lambda_mask=0.1, lambda_norm=0.01)
        pipe_cfg = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)

        # two distinct cameras + two distinct images
        rng = np.random.RandomState(7)
        cams = []
        for dz in (4.0, 4.3):
            R = np.eye(3, dtype=np.float32)
            t = np.array([0.1, -0.05, dz], np.float32)
            w2v = cm.get_world2view(R, t).T
            proj = cm.get_projection_matrix(0.01, 100.0, 0.8, 0.8).T
            cams.append((w2v, (w2v @ proj).astype(np.float32),
                         np.linalg.inv(w2v.T)[:3, 3].astype(np.float32)))
        batch = {
            "viewmatrix": jnp.asarray(np.stack([c[0] for c in cams])),
            "projmatrix": jnp.asarray(np.stack([c[1] for c in cams])),
            "campos": jnp.asarray(np.stack([c[2] for c in cams])),
            "tanfovx": jnp.full((cls.V,), s["tanfov"], jnp.float32),
            "tanfovy": jnp.full((cls.V,), s["tanfov"], jnp.float32),
            "fid": jnp.asarray(0.4 if n_frames else 0.0, jnp.float32),
            "image": jnp.asarray(
                rng.rand(cls.V, 3, cls.H, cls.W).astype(np.float32)),
            "mask": jnp.asarray(
                (rng.rand(cls.V, 1, cls.H, cls.W) > 0.5).astype(np.float32)),
            "bg": jnp.ones(3, jnp.float32),
        }
        return s, params, stats, splat_opt, deform, opt_cfg, pipe_cfg, batch

    @staticmethod
    def _clone(tree):
        import jax
        import jax.numpy as jnp
        return jax.tree.map(lambda a: jnp.array(np.asarray(a)), tree)

    def _run_single(self, setup, field_mode, sh_degree, n_frames=0):
        import jax
        import jax.numpy as jnp
        from splatfields_tpu import train_lib
        from splatfields_tpu.models import splats as splats_lib
        s, params, stats, splat_opt, deform, opt_cfg, pipe_cfg, batch = setup
        params, stats, splat_opt = (self._clone(params), self._clone(stats),
                                    self._clone(splat_opt))
        net = deform.net if deform else None
        step = train_lib.make_train_step(
            net, opt_cfg, pipe_cfg, self.W, self.H, num_views=self.V,
            field_mode=field_mode, n_frames=n_frames, sh_degree=sh_degree)
        lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
        fv = self._clone(deform.variables if deform else {"params": {}})
        fo = self._clone(deform.opt_state if deform
                         else splats_lib.adam_init({}))
        b = dict(batch)
        return step(params, stats, splat_opt, fv, fo, b, lrs,
                    jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(0))

    def _run_sharded(self, setup, field_mode, sh_degree, n_dev, data,
                     ring=False, n_frames=0):
        import jax.numpy as jnp
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.parallel.mesh import make_mesh
        from splatfields_tpu.parallel.step import (
            make_sharded_train_step, replicate, shard_train_state)
        s, params, stats, splat_opt, deform, opt_cfg, pipe_cfg, batch = setup
        params, stats, splat_opt = (self._clone(params), self._clone(stats),
                                    self._clone(splat_opt))
        mesh = make_mesh(n_dev, data=data)
        net = deform.net if deform else None
        step = make_sharded_train_step(
            net, opt_cfg, pipe_cfg, self.W, self.H,
            views_per_shard=self.V // data, field_mode=field_mode,
            n_frames=n_frames, mesh=mesh, sh_degree=sh_degree, ring=ring,
            batch_keys=tuple(batch.keys()))
        lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
        fv = self._clone(deform.variables if deform else {"params": {}})
        fo = self._clone(deform.opt_state if deform
                         else splats_lib.adam_init({}))
        with mesh:
            sp, st, so = shard_train_state(params, stats, splat_opt, mesh)
            fvr = replicate(fv, mesh)
            for_ = replicate(fo, mesh)
            return step(sp, st, so, fvr, for_, batch, lrs,
                        jnp.asarray(1e-3, jnp.float32))

    @staticmethod
    def _tree_close(a, b, atol, what):
        import jax
        for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), atol=atol, rtol=1e-4,
                err_msg=what)

    def test_field_mode_4d_sharded_matches_single(self):
        """BASELINE config 4 shape on-mesh: n_frames>0 (ResField deltas +
        offset flow + time embeds) through the sharded step, data=2 x
        model=4, must equal the single-device step."""
        setup = self._setup(field_mode=True, n_frames=4)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(
            setup, True, 0, n_frames=4)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, True, 0, n_dev=8, data=2, n_frames=4)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(fp1, fp8, 2e-5, "field params (4D)")
        self._tree_close(sp1, sp8, 2e-5, "splat params (4D)")

    def test_field_mode_model_sharded_matches_single(self):
        """data=1 x model=8: everything incl. stats must match 1-dev."""
        setup = self._setup(field_mode=True)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(setup, True, 0)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, True, 0, n_dev=8, data=1)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(fp1, fp8, 2e-5, "field params")
        self._tree_close(sp1, sp8, 2e-5, "splat params")
        np.testing.assert_allclose(
            np.asarray(st1.xyz_gradient_accum), np.asarray(st8.xyz_gradient_accum),
            atol=1e-5, err_msg="densify accum")
        np.testing.assert_allclose(
            np.asarray(st1.denom), np.asarray(st8.denom), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st1.max_radii2d), np.asarray(st8.max_radii2d),
            atol=0.0)

    def test_sharded_step_with_corr_gate(self):
        """--corr_interval threads a replicated corr_gate scalar through
        the sharded batch (parallel/step.py batch_spec); gated-on loss
        must match the single-device gated-on loss."""
        import dataclasses as dc
        import jax.numpy as jnp
        setup = self._setup(field_mode=False)
        s, params, stats, splat_opt, deform, opt_cfg, pipe_cfg, batch = setup
        opt_cfg = dc.replace(opt_cfg, lambda_corr=0.01, corr_interval=2)
        batch = dict(batch, corr_gate=jnp.ones((), jnp.float32))
        setup = (s, params, stats, splat_opt, deform, opt_cfg, pipe_cfg,
                 batch)
        *_, out1, _ = self._run_single(setup, False, 0)
        *_, out8 = self._run_sharded(setup, False, 0, n_dev=8, data=1)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4

    def test_sharded_densify_matches_host(self):
        """On-mesh densify (parallel/step.py::make_sharded_densify) must
        reproduce the host-path global densify bit-for-bit-ish: same rng,
        same program, only the partitioning differs (VERDICT r2 item 5)."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.parallel.mesh import make_mesh
        from splatfields_tpu.parallel.step import (
            make_sharded_densify, shard_train_state)

        setup = self._setup(field_mode=False)
        _, params, stats, splat_opt, *_ = setup
        # make the stats non-trivial so clones/splits/prunes all fire
        rng = np.random.RandomState(3)
        stats = dataclasses.replace(
            stats,
            xyz_gradient_accum=jnp.asarray(
                rng.rand(128).astype(np.float32) * 6e-4),
            denom=jnp.ones(128, jnp.float32),
            valid=jnp.asarray(rng.rand(128) > 0.1))
        key = jax.random.PRNGKey(5)
        hp, hs, ho, hdrop = splats_lib.densify_and_prune(
            self._clone(params), self._clone(stats), self._clone(splat_opt),
            key, 2e-4, 0.005, 1.5, 0.0, percent_dense=0.01)

        mesh = make_mesh(8, data=1)
        sp, st, so = shard_train_state(
            self._clone(params), self._clone(stats),
            self._clone(splat_opt), mesh)
        dens = make_sharded_densify(mesh, 0.0, 0.01)
        mp, ms, mo, mdrop = dens(sp, st, so, key, jnp.float32(2e-4),
                                 jnp.float32(0.005), jnp.float32(1.5))
        assert int(hdrop) == int(mdrop)
        self._tree_close(hp, mp, 1e-6, "densified params")
        self._tree_close(hs, ms, 1e-6, "densified stats")
        self._tree_close(ho.mu, mo.mu, 1e-6, "densified adam mu")

    def test_field_mode_data_and_model_sharded_matches_single(self):
        """data=2 x model=4 with different images per data shard: loss and
        updated params must still match the single-device step (the grads
        pmean over 'data' = mean over views)."""
        setup = self._setup(field_mode=True)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(setup, True, 0)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, True, 0, n_dev=8, data=2)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(fp1, fp8, 2e-5, "field params")
        self._tree_close(sp1, sp8, 2e-5, "splat params")

    def test_static_mode_sh_matches_single(self):
        """Static mode with SH degree 1 (the real SH path, not a DC hack):
        splat params and stats must match 1-dev."""
        setup = self._setup(field_mode=False, sh_degree=1)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(setup, False, 1)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, False, 1, n_dev=8, data=1)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(sp1, sp8, 2e-5, "splat params")
        np.testing.assert_allclose(
            np.asarray(st1.xyz_gradient_accum),
            np.asarray(st8.xyz_gradient_accum), atol=1e-5)

    def test_field_mode_ring_exchange_matches_single(self):
        """ring=True: Gaussian blocks ppermute around the 'model' ring
        against fixed tile shards (no full attribute all_gather). Loss,
        updated params AND densification stats must still match the
        single-device step exactly — including the screenspace-offset
        gradient, which returns to its owner through the ppermute
        transpose."""
        setup = self._setup(field_mode=True)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(setup, True, 0)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, True, 0, n_dev=8, data=1, ring=True)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(fp1, fp8, 2e-5, "field params (ring)")
        self._tree_close(sp1, sp8, 2e-5, "splat params (ring)")
        np.testing.assert_allclose(
            np.asarray(st1.xyz_gradient_accum),
            np.asarray(st8.xyz_gradient_accum),
            atol=1e-5, err_msg="densify accum (ring)")
        np.testing.assert_allclose(
            np.asarray(st1.max_radii2d), np.asarray(st8.max_radii2d),
            atol=0.0)

    def test_static_mode_ring_exchange_matches_single(self):
        """ring=True on the static SH path (shs evaluated per block)."""
        setup = self._setup(field_mode=False, sh_degree=1)
        sp1, st1, so1, fp1, fo1, out1, _ = self._run_single(setup, False, 1)
        sp8, st8, so8, fp8, fo8, out8 = self._run_sharded(
            setup, False, 1, n_dev=8, data=1, ring=True)
        assert abs(float(out1.loss) - float(out8.loss)) < 1e-4
        self._tree_close(sp1, sp8, 2e-5, "splat params (ring static)")

    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_dryrun_4_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(4)


class TestMiniCam:
    def test_minicam_renders_like_camera(self):
        """MiniCam (matrices-only viewer camera, reference
        scene/cameras.py:164-175) duck-types Camera through
        render_camera: identical output for identical matrices."""
        import jax.numpy as jnp
        from splatfields_tpu import config as cfg_lib
        from splatfields_tpu.data.cameras import Camera, MiniCam
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.render_lib import render_camera
        import __graft_entry__ as ge

        s = ge._tiny_scene(n=64, width=24, height=24)
        params, stats = splats_lib.create_from_pcd(
            s["means"], np.abs(s["means"]), 0, capacity=64)
        pipe_cfg = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
        cam = Camera(uid=0, colmap_id=0,
                     R=np.eye(3, dtype=np.float32),
                     T=np.array([0, 0, 4.0], np.float32),
                     FoVx=0.8, FoVy=0.8, image_name="t",
                     image_width=24, image_height=24, fid=0.0)
        mini = MiniCam(
            image_width=24, image_height=24, FoVy=0.8, FoVx=0.8,
            znear=0.01, zfar=100.0,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform)
        np.testing.assert_allclose(mini.camera_center, cam.camera_center,
                                   atol=1e-6)
        bg = jnp.zeros(3, jnp.float32)
        a = render_camera(cam, params, stats, None, pipe_cfg, bg,
                          field_mode=False)
        b = render_camera(mini, params, stats, None, pipe_cfg, bg,
                          field_mode=False)
        np.testing.assert_array_equal(np.asarray(a["render"]),
                                      np.asarray(b["render"]))


class TestBatchedRender:
    def test_batched_matches_per_frame(self):
        """render_cameras_batched (K frames per dispatch via lax.scan —
        the serving twin of the scanned train step) must reproduce
        render_camera exactly, including the padded tail chunk."""
        import jax.numpy as jnp
        from splatfields_tpu import config as cfg_lib
        from splatfields_tpu.data.cameras import Camera
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.render_lib import (render_camera,
                                                render_cameras_batched)
        import __graft_entry__ as ge

        s = ge._tiny_scene(n=64, width=24, height=24)
        params, stats = splats_lib.create_from_pcd(
            s["means"], np.abs(s["means"]), 0, capacity=64)
        pipe_cfg = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
        cams = []
        for i in range(3):   # 3 cams, batch=2 -> exercises tail padding
            th = 0.4 * i
            c, sn = np.cos(th), np.sin(th)
            R = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]], np.float32)
            cams.append(Camera(
                uid=i, colmap_id=i, R=R,
                T=np.array([0.1 * i, 0, 4.0], np.float32),
                FoVx=0.8, FoVy=0.8, image_name=f"c{i}",
                image_width=24, image_height=24, fid=0.0))
        bg = jnp.zeros(3, jnp.float32)
        per_frame = [render_camera(c, params, stats, None, pipe_cfg, bg,
                                   field_mode=False) for c in cams]
        batched = list(render_cameras_batched(
            cams, params, stats, None, pipe_cfg, bg, field_mode=False,
            batch=2))
        assert len(batched) == 3
        for a, b in zip(per_frame, batched):
            np.testing.assert_allclose(np.asarray(a["render"]),
                                       np.asarray(b["render"]),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(a["depth"]),
                                       np.asarray(b["depth"]),
                                       rtol=1e-6, atol=1e-6)
            assert int(a["n_dropped"]) == int(b["n_dropped"])
