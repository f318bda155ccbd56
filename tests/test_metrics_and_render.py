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
    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_dryrun_4_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(4)

    def test_sharded_matches_single_device_loss(self):
        """The sharded loss must equal the unsharded computation."""
        import jax
        import jax.numpy as jnp
        import dataclasses
        from splatfields_tpu import config as cfg_lib
        from splatfields_tpu.models import splats as splats_lib
        from splatfields_tpu.models.deform_model import DeformModel
        from splatfields_tpu.parallel.mesh import make_mesh
        from splatfields_tpu.parallel.step import (
            make_sharded_train_step, replicate, shard_splats)
        import __graft_entry__ as ge

        s = ge._tiny_scene(n=128, width=32, height=32)
        params, stats = splats_lib.create_from_pcd(
            s["means"], np.abs(s["means"]), 0, capacity=128)
        hidden = cfg_lib.HiddenConfig(
            encoder_type="none", composition_rank=0, n_frames=0)
        deform = DeformModel(hidden, radius=1.0)
        opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0)
        pipe_cfg = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)

        img0 = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
        def make_batch(views):
            return {
                "viewmatrix": jnp.asarray(np.stack([s["w2v"]] * views)),
                "projmatrix": jnp.asarray(np.stack([s["full"]] * views)),
                "campos": jnp.asarray(np.stack([s["campos"]] * views)),
                "tanfovx": jnp.full((views,), s["tanfov"], jnp.float32),
                "tanfovy": jnp.full((views,), s["tanfov"], jnp.float32),
                "fid": jnp.zeros((views,), jnp.float32),
                "image": jnp.asarray(img0.repeat(views, 0)),
                "mask": jnp.zeros((views, 1, 32, 32), jnp.float32),
                "bg": jnp.ones(3, jnp.float32),
            }

        losses = {}
        for n_dev, data in ((1, 1), (8, 2)):
            mesh = make_mesh(n_dev, data=data)
            step = make_sharded_train_step(
                deform.net, opt_cfg, pipe_cfg, 32, 32,
                views_per_shard=2 // data if data > 1 else 2,
                field_mode=True, n_frames=0, mesh=mesh)
            with mesh:
                sp, valid = shard_splats(params, stats, mesh)
                fv = replicate(deform.variables, mesh)
                fo = replicate(deform.opt_state, mesh)
                loss, _, _ = step(sp, valid, fv, make_batch(2),
                                  jnp.asarray(1e-3, jnp.float32), fo)
            losses[n_dev] = float(loss)
        assert abs(losses[1] - losses[8]) < 1e-4, losses
