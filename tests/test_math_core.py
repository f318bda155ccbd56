"""Core math library tests vs NumPy / torch-CPU oracles.

Covers ops/sh.py, utils/transforms.py, utils/camera_math.py, ops/ssim.py,
ops/grid_sample.py, ops/knn.py against closed-form or torch reference
implementations (torch CPU is available in the test env as an oracle only —
never in the library itself).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from splatfields_tpu.ops import sh as sh_ops
from splatfields_tpu.ops import ssim as ssim_ops
from splatfields_tpu.ops import grid_sample as gs_ops
from splatfields_tpu.ops import knn as knn_ops
from splatfields_tpu.utils import transforms as tf
from splatfields_tpu.utils import camera_math as cm


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


class TestSH:
    def test_deg0_is_c0_times_dc(self):
        shs = rand(10, 3, 1)
        dirs = rand(10, 3)
        out = sh_ops.eval_sh(0, jnp.asarray(shs), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(out), 0.28209479177387814 * shs[..., 0], rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_rotation_invariance_of_dc(self, deg):
        # only the DC band is isotropic: evaluating with sh coeffs zero
        # except DC must be direction independent
        n = 16
        shs = np.zeros((n, 3, (deg + 1) ** 2), np.float32)
        shs[..., 0] = rand(n, 3, seed=1)
        d1 = rand(n, 3, seed=2)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        d2 = rand(n, 3, seed=3)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        o1 = sh_ops.eval_sh(deg, jnp.asarray(shs), jnp.asarray(d1))
        o2 = sh_ops.eval_sh(deg, jnp.asarray(shs), jnp.asarray(d2))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def test_addition_theorem_band1(self):
        # band-1 SH at +z: only the z coefficient contributes
        shs = np.zeros((1, 1, 4), np.float32)
        shs[0, 0] = [0.0, 1.0, 2.0, 3.0]
        dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
        out = sh_ops.eval_sh(1, jnp.asarray(shs), jnp.asarray(dirs))
        expect = 0.4886025119029199 * 2.0
        np.testing.assert_allclose(np.asarray(out)[0, 0], expect, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = np.random.RandomState(0).rand(5, 3).astype(np.float32)
        back = sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(jnp.asarray(rgb)))
        np.testing.assert_allclose(np.asarray(back), rgb, rtol=1e-5)


class TestTransforms:
    def test_quat_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        R = tf.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)

    def test_quat_orthonormal(self):
        q = jnp.asarray(rand(32, 4, seed=4))
        R = np.asarray(tf.quat_to_rotmat(q))
        for i in range(32):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R[i]) > 0.99

    def test_quat_90deg_z(self):
        # rotation by 90 deg about z: q = (cos45, 0, 0, sin45)
        s = np.sqrt(0.5).astype(np.float32)
        R = np.asarray(tf.quat_to_rotmat(jnp.array([[s, 0, 0, s]])))[0]
        expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expect, atol=1e-6)

    def test_covariance_psd_and_eigs(self):
        scales = np.abs(rand(16, 3, seed=5)) + 0.1
        quats = rand(16, 4, seed=6)
        cov = np.asarray(tf.build_covariance(jnp.asarray(scales), jnp.asarray(quats)))
        for i in range(16):
            eig = np.sort(np.linalg.eigvalsh(cov[i]))
            np.testing.assert_allclose(eig, np.sort(scales[i] ** 2), rtol=1e-4)

    def test_exp_so3_vs_scipy_formula(self):
        w = rand(8, 3, seed=7)
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        theta = np.abs(rand(8, 1, seed=8))
        R = np.asarray(tf.exp_so3(jnp.asarray(w), jnp.asarray(theta)))
        for i in range(8):
            # Rodrigues via matrix exponential oracle
            W = np.array([
                [0, -w[i, 2], w[i, 1]],
                [w[i, 2], 0, -w[i, 0]],
                [-w[i, 1], w[i, 0], 0],
            ])
            from scipy.linalg import expm
            np.testing.assert_allclose(R[i], expm(W * theta[i, 0]), atol=1e-5)

    def test_exp_se3_pure_translation(self):
        # w = 0 => exp is identity rotation, translation = theta * v
        S = np.zeros((4, 6), np.float32)
        S[:, 3:] = rand(4, 3, seed=9)
        theta = np.abs(rand(4, 1, seed=10))
        T = np.asarray(tf.exp_se3(jnp.asarray(S), jnp.asarray(theta)))
        for i in range(4):
            np.testing.assert_allclose(T[i, :3, :3], np.eye(3), atol=1e-6)
            np.testing.assert_allclose(T[i, :3, 3], theta[i, 0] * S[i, 3:], atol=1e-5)


class TestCameraMath:
    def test_projection_matches_reference_formula(self):
        import math
        znear, zfar = 0.01, 100.0
        fovx, fovy = 0.8, 0.6
        P = cm.get_projection_matrix(znear, zfar, fovx, fovy)
        tx, ty = math.tan(fovx / 2), math.tan(fovy / 2)
        assert abs(P[0, 0] - 1 / tx) < 1e-6
        assert abs(P[1, 1] - 1 / ty) < 1e-6
        assert abs(P[3, 2] - 1.0) < 1e-6
        assert abs(P[2, 2] - zfar / (zfar - znear)) < 1e-6
        assert abs(P[2, 3] + zfar * znear / (zfar - znear)) < 1e-6

    def test_world2view_roundtrip(self):
        q = rand(1, 4, seed=11)
        R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))[0]
        t = rand(3, seed=12)
        w2v = cm.get_world2view(R, t)
        c2w = np.linalg.inv(w2v)
        # camera center maps to origin
        center = c2w[:3, 3]
        p = w2v @ np.append(center, 1.0)
        np.testing.assert_allclose(p[:3], 0, atol=1e-5)

    def test_nerfpp_norm_radius(self):
        # cameras on a unit circle -> radius ~= 1.1
        w2cs = []
        for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            c2w = np.eye(4)
            c2w[:3, 3] = [np.cos(ang), np.sin(ang), 0.0]
            w2cs.append(np.linalg.inv(c2w))
        out = cm.get_nerfpp_norm(w2cs)
        np.testing.assert_allclose(out["radius"], 1.1, rtol=1e-5)

    def test_fov_focal_roundtrip(self):
        fov = 0.9
        assert abs(cm.focal2fov(cm.fov2focal(fov, 800), 800) - fov) < 1e-9


class TestSSIM:
    def _torch_ssim(self, a, b):
        # oracle: the reference's exact torch implementation
        from math import exp as _exp

        def gaussian(window_size, sigma):
            g = torch.tensor(
                [_exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
            )
            return g / g.sum()

        w1 = gaussian(11, 1.5).unsqueeze(1)
        window = w1.mm(w1.t()).float().unsqueeze(0).unsqueeze(0)
        c = a.size(-3)
        window = window.expand(c, 1, 11, 11).contiguous()
        mu1 = tF.conv2d(a, window, padding=5, groups=c)
        mu2 = tF.conv2d(b, window, padding=5, groups=c)
        mu1_sq, mu2_sq, mu1mu2 = mu1**2, mu2**2, mu1 * mu2
        s1 = tF.conv2d(a * a, window, padding=5, groups=c) - mu1_sq
        s2 = tF.conv2d(b * b, window, padding=5, groups=c) - mu2_sq
        s12 = tF.conv2d(a * b, window, padding=5, groups=c) - mu1mu2
        C1, C2 = 0.01**2, 0.03**2
        m = ((2 * mu1mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    def test_matches_torch_reference(self):
        rng = np.random.RandomState(0)
        a = rng.rand(3, 32, 40).astype(np.float32)
        b = np.clip(a + rng.randn(3, 32, 40).astype(np.float32) * 0.05, 0, 1)
        ours = float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(b)))
        oracle = self._torch_ssim(torch.from_numpy(a)[None], torch.from_numpy(b)[None])
        assert abs(ours - oracle) < 1e-5

    def test_identity_is_one(self):
        a = np.random.RandomState(1).rand(3, 16, 16).astype(np.float32)
        assert abs(float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6

    def test_psnr(self):
        a = np.zeros((3, 8, 8), np.float32)
        b = np.full((3, 8, 8), 0.1, np.float32)
        got = float(ssim_ops.psnr(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - 20.0) < 1e-4


class TestGridSample:
    @pytest.mark.parametrize("align", [False, True])
    @pytest.mark.parametrize("pad", ["zeros", "border"])
    def test_2d_matches_torch(self, align, pad):
        rng = np.random.RandomState(2)
        plane = rng.randn(4, 9, 7).astype(np.float32)
        coords = (rng.rand(50, 2).astype(np.float32) * 2.4 - 1.2)  # incl. out of bounds
        ours = np.asarray(gs_ops.grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords),
                                                align_corners=align, padding_mode=pad))
        tor = tF.grid_sample(
            torch.from_numpy(plane)[None],
            torch.from_numpy(coords)[None, None],  # [1,1,N,2]
            mode="bilinear", padding_mode=pad, align_corners=align,
        )[0, :, 0].T.numpy()  # [N, C]
        np.testing.assert_allclose(ours, tor, atol=1e-5)

    def test_const_coords_fast_path(self):
        """Row-gather fwd / channel-scatter bwd variant must match
        grid_sample_2d's forward AND plane gradient exactly (its coords
        cotangent is zero by contract)."""
        rng = np.random.RandomState(5)
        plane = jnp.asarray(rng.randn(4, 9, 7).astype(np.float32))
        coords = jnp.asarray(
            (rng.rand(60, 2).astype(np.float32) * 2.4 - 1.2))
        ref = gs_ops.grid_sample_2d(plane, coords)
        fast = gs_ops.grid_sample_2d_const_coords(plane, coords)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)
        g = jnp.asarray(rng.rand(60, 4).astype(np.float32))
        g_ref = jax.grad(
            lambda p: jnp.sum(gs_ops.grid_sample_2d(p, coords) * g))(plane)
        g_fast = jax.grad(lambda p: jnp.sum(
            gs_ops.grid_sample_2d_const_coords(p, coords) * g))(plane)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-5)
        g_coords = jax.grad(lambda c: jnp.sum(
            gs_ops.grid_sample_2d_const_coords(plane, c)))(coords)
        assert float(jnp.abs(g_coords).max()) == 0.0

    def test_quad_packed_path(self):
        """Quad-packed (one gather / one scatter) variant must match
        grid_sample_2d's forward AND plane gradient exactly, including the
        edge reroutes (floor == -1 and floor == size-1) and fully
        out-of-bounds points."""
        rng = np.random.RandomState(7)
        plane = jnp.asarray(rng.randn(4, 9, 7).astype(np.float32))
        # dense coverage of edge cells plus random in/out-of-bounds points
        edge = np.array([
            [-1.0 + 1e-4, 0.0], [1.0 - 1e-4, 0.0], [0.0, -1.0 + 1e-4],
            [0.0, 1.0 - 1e-4], [-1.05, -1.05], [1.05, 1.05],
            [-0.999, 0.999], [-1.3, 0.2], [0.2, 1.3], [-1.0, -1.0],
        ], np.float32)
        coords = jnp.asarray(np.concatenate(
            [edge, rng.rand(60, 2).astype(np.float32) * 2.4 - 1.2]))
        n = coords.shape[0]
        ref = gs_ops.grid_sample_2d(plane, coords)
        fast = gs_ops.grid_sample_2d_quad(plane, coords)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)
        g = jnp.asarray(rng.rand(n, 4).astype(np.float32))
        g_ref = jax.grad(
            lambda p: jnp.sum(gs_ops.grid_sample_2d(p, coords) * g))(plane)
        g_fast = jax.grad(lambda p: jnp.sum(
            gs_ops.grid_sample_2d_quad(p, coords) * g))(plane)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-5)
        g_coords = jax.grad(lambda c: jnp.sum(
            gs_ops.grid_sample_2d_quad(plane, c)))(coords)
        assert float(jnp.abs(g_coords).max()) == 0.0
        # the explicit fold helper equals autodiff through pack_quad_rows
        rows = gs_ops.pack_quad_rows(plane)
        gq = jax.grad(lambda r: jnp.sum(
            gs_ops._quad_sample(r, coords, (9, 7)) * g))(rows)
        folded = gs_ops.quad_rows_grad_to_plane(gq, 9, 7)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(g_ref),
                                   atol=1e-5)

    def test_quad_sorted_plane_grad(self, monkeypatch):
        """SPLATFIELDS_SORTED_PLANE_GRAD=on replaces the backward's scatter
        with a sort + cumsum + boundary-diff segment sum; the plane gradient
        must match the scatter path to float tolerance (summation order
        differs), including empty rows, hot rows (many points in one cell)
        and out-of-bounds points."""
        rng = np.random.RandomState(13)
        plane = jnp.asarray(rng.randn(6, 17, 13).astype(np.float32))
        # cluster many points into few cells so segments are long, and add
        # out-of-bounds points (zero weights) plus uniform coverage
        hot = np.tile(np.array([[0.31, -0.47]], np.float32), (400, 1))
        hot += rng.randn(400, 2).astype(np.float32) * 1e-3
        coords = jnp.asarray(np.concatenate([
            hot,
            rng.rand(800, 2).astype(np.float32) * 2.4 - 1.2,
            np.array([[-1.4, 0.0], [0.0, 1.4]], np.float32),
        ]))
        g = jnp.asarray(rng.rand(coords.shape[0], 6).astype(np.float32))

        def loss(p):
            return jnp.sum(gs_ops.grid_sample_2d_quad(p, coords) * g)

        g_scatter = jax.grad(loss)(plane)
        monkeypatch.setenv("SPLATFIELDS_SORTED_PLANE_GRAD", "on")
        g_sorted = jax.grad(loss)(plane)
        np.testing.assert_allclose(np.asarray(g_sorted),
                                   np.asarray(g_scatter),
                                   rtol=1e-5, atol=1e-4)

    def test_plane_grad_knob_conflict_raises(self, monkeypatch):
        """Both plane-grad knobs on => explicit error, not silent shadowing
        (the env vars are read at trace time)."""
        import pytest
        rng = np.random.RandomState(3)
        plane = jnp.asarray(rng.randn(4, 9, 7).astype(np.float32))
        coords = jnp.asarray(rng.rand(16, 2).astype(np.float32) - 0.5)
        monkeypatch.setenv("SPLATFIELDS_SORTED_PLANE_GRAD", "on")
        monkeypatch.setenv("SPLATFIELDS_PLANE_GRAD_PALLAS", "on")
        with pytest.raises(ValueError, match="at most one"):
            jax.grad(lambda p: jnp.sum(
                gs_ops.grid_sample_2d_quad(p, coords)))(plane)

    def test_quad_multi_matches_per_plane(self):
        """The batched multi-plane quad sampler (one gather/scatter for all
        planes) must match per-plane grid_sample_2d forward AND per-plane
        gradients."""
        rng = np.random.RandomState(11)
        planes = jnp.asarray(rng.randn(3, 4, 9, 7).astype(np.float32))
        pts = jnp.asarray(rng.rand(50, 3).astype(np.float32) * 2.4 - 1.2)
        axes = ((0, 1), (1, 2), (2, 0))
        coords_list = [pts[:, list(ax)] for ax in axes]
        out = gs_ops.grid_sample_2d_quad_multi(planes, coords_list)
        assert out.shape == (50, 3, 4)
        for i in range(3):
            ref = gs_ops.grid_sample_2d(planes[i], coords_list[i])
            np.testing.assert_allclose(np.asarray(out[:, i]),
                                       np.asarray(ref), atol=1e-5)
        g = jnp.asarray(rng.rand(50, 3, 4).astype(np.float32))
        g_multi = jax.grad(lambda p: jnp.sum(
            gs_ops.grid_sample_2d_quad_multi(p, coords_list) * g))(planes)
        for i in range(3):
            g_ref = jax.grad(lambda p: jnp.sum(
                gs_ops.grid_sample_2d(p, coords_list[i]) * g[:, i]))(
                    planes[i])
            np.testing.assert_allclose(np.asarray(g_multi[i]),
                                       np.asarray(g_ref), atol=1e-5)

    @pytest.mark.parametrize("align", [False, True])
    def test_3d_matches_torch(self, align):
        rng = np.random.RandomState(3)
        grid = rng.randn(2, 5, 6, 7).astype(np.float32)
        coords = (rng.rand(40, 3).astype(np.float32) * 2.2 - 1.1)
        ours = np.asarray(gs_ops.grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords),
                                                align_corners=align))
        tor = tF.grid_sample(
            torch.from_numpy(grid)[None],
            torch.from_numpy(coords)[None, None, None],  # [1,1,1,N,3]
            mode="bilinear", padding_mode="zeros", align_corners=align,
        )[0, :, 0, 0].T.numpy()
        np.testing.assert_allclose(ours, tor, atol=1e-5)


class TestKNN:
    def test_knn_exact_vs_numpy(self):
        pts = rand(200, 3, seed=13)
        d, idx = knn_ops.knn_self(jnp.asarray(pts), k=3, chunk=64)
        d, idx = np.asarray(d), np.asarray(idx)
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        expect_idx = np.argsort(full, axis=1)[:, :3]
        expect_d = np.sort(full, axis=1)[:, :3]
        np.testing.assert_allclose(d, expect_d, rtol=1e-3, atol=1e-5)
        # indices can differ under ties; distances must match
        got_d = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(got_d, expect_d, rtol=1e-3, atol=1e-5)

    def test_knn_points_cross_set_vs_numpy(self):
        pts = rand(150, 3, seed=14)
        qs = rand(77, 3, seed=15)
        d, idx = knn_ops.knn_points(jnp.asarray(qs), jnp.asarray(pts),
                                    k=4, chunk=32)
        d, idx = np.asarray(d), np.asarray(idx)
        full = ((qs[:, None] - pts[None]) ** 2).sum(-1)
        expect_d = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(d, expect_d, rtol=1e-3, atol=1e-5)
        got_d = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(got_d, expect_d, rtol=1e-3, atol=1e-5)

    def test_mean_sq_dist_knn3_grid(self):
        # regular 1-spaced grid: 3 NNs are at distance 1 -> mean sq dist 1
        g = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(4)), -1)
        pts = g.reshape(-1, 3).astype(np.float32)
        out = np.asarray(knn_ops.mean_sq_dist_knn3(jnp.asarray(pts), chunk=64))
        # interior points have >=3 neighbors at distance 1
        np.testing.assert_allclose(out, 1.0, atol=1e-5)

    def test_morans_perfect_correlation(self):
        # constant feature => Moran's I == K * sum(w)/W / ... -> 1 for
        # normalized weights: with x constant, nom/denom = sum w_ij/K ... just
        # check the loss is ~0 for constant features (perfect autocorrelation)
        pts = rand(100, 3, seed=14)
        w, idx = knn_ops.query_nn(jnp.asarray(pts), n_neighbors=5)
        feats = jnp.ones((100, 4))
        loss = float(knn_ops.morans_loss(w, feats[idx]))
        assert loss < 0.25

    def test_morans_random_worse_than_smooth(self):
        pts = rand(200, 3, seed=15)
        w, idx = knn_ops.query_nn(jnp.asarray(pts), n_neighbors=5)
        smooth = jnp.asarray(pts[:, :1])  # feature = x coordinate: smooth
        noise = jnp.asarray(rand(200, 1, seed=16))
        l_smooth = float(knn_ops.morans_loss(w, smooth[idx]))
        l_noise = float(knn_ops.morans_loss(w, noise[idx]))
        assert l_smooth < l_noise
