"""Splat store tests: activations, Adam vs torch, densification invariants,
PLY round trip."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from splatfields_tpu.models import splats as S


def make_splats(n=64, cap=128, seed=0, sh_degree=1):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return S.create_from_pcd(pts, cols, sh_degree, capacity=cap)


class TestInit:
    def test_create_from_pcd_shapes_and_values(self):
        params, stats = make_splats()
        assert params.capacity == 128
        assert int(stats.valid.sum()) == 64
        op = np.asarray(S.get_opacity(params))[:64]
        np.testing.assert_allclose(op, 0.1, atol=1e-6)
        rot = np.asarray(S.get_rotation(params))[:64]
        np.testing.assert_allclose(rot[:, 0], 1.0, atol=1e-6)
        # scale init: log sqrt(mean sq dist of 3 NN) — positive distances
        sc = np.asarray(S.get_scaling(params))[:64]
        assert (sc > 0).all()

    def test_isotropic_mode(self):
        rng = np.random.RandomState(1)
        pts = rng.rand(10, 3).astype(np.float32)
        params, _ = S.create_from_pcd(pts, pts, 0, isotropic=True)
        assert params.scaling.shape == (10, 1)
        assert S.get_scaling(params).shape == (10, 3)


class TestAdam:
    def test_matches_torch_adam(self):
        rng = np.random.RandomState(2)
        p0 = rng.randn(20, 3).astype(np.float32)
        steps = 5
        grads = [rng.randn(20, 3).astype(np.float32) * 0.1 for _ in range(steps)]

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
        for g in grads:
            tp.grad = torch.from_numpy(g.copy())
            opt.step()

        params = jnp.asarray(p0)
        state = S.adam_init(params)
        for g in grads:
            params, state = S.adam_update(params, jnp.asarray(g), state, 1e-2)
        np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                                   atol=1e-6, rtol=1e-5)

    def test_per_group_lrs(self):
        params, _ = make_splats()
        lrs = S.splat_lr_tree(1e-3, 2.5e-3, 0.05, 1e-3, 1e-3)
        grads = jax.tree.map(jnp.ones_like, params)
        state = S.adam_init(params)
        new_params, _ = S.adam_update(params, grads, state, lrs)
        # xyz step = lr * 5 (spatial scale) * sign; opacity step = 0.05
        dx = np.abs(np.asarray(new_params.xyz - params.xyz)).max()
        dop = np.abs(np.asarray(new_params.opacity - params.opacity)).max()
        np.testing.assert_allclose(dx, 5e-3, rtol=1e-4)
        np.testing.assert_allclose(dop, 0.05, rtol=1e-4)

class TestDensify:
    def _stats_with_grads(self, stats, grads_value, n):
        accum = np.zeros(stats.valid.shape[0], np.float32)
        denom = np.zeros_like(accum)
        accum[:n] = grads_value
        denom[:n] = 1.0
        return dataclasses.replace(
            stats,
            xyz_gradient_accum=jnp.asarray(accum),
            denom=jnp.asarray(denom),
        )

    def test_no_op_below_threshold(self):
        params, stats = make_splats()
        opt = S.adam_init(params)
        stats = self._stats_with_grads(stats, 1e-6, 64)
        p2, s2, _, dropped = S.densify_and_prune(
            params, stats, opt, jax.random.PRNGKey(0),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        assert int(dropped) == 0
        assert int(s2.valid.sum()) == 64
        # survivors keep values (possibly permuted); sets of xyz equal
        a = np.sort(np.asarray(params.xyz)[:64], axis=0)
        b = np.sort(np.asarray(p2.xyz)[np.asarray(s2.valid)], axis=0)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_clone_small_high_grad(self):
        params, stats = make_splats()
        # make all splats tiny so they clone rather than split
        params = dataclasses.replace(
            params, scaling=jnp.full_like(params.scaling, -8.0))
        opt = S.adam_init(params)
        stats = self._stats_with_grads(stats, 1.0, 64)
        p2, s2, _, dropped = S.densify_and_prune(
            params, stats, opt, jax.random.PRNGKey(0),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        assert int(dropped) == 0
        assert int(s2.valid.sum()) == 128  # all cloned

    def test_split_large_high_grad(self):
        params, stats = make_splats(n=32, cap=128)
        params = dataclasses.replace(
            params, scaling=jnp.full_like(params.scaling, 0.0))  # scale 1 >> 1%*extent
        opt = S.adam_init(params)
        stats = self._stats_with_grads(stats, 1.0, 32)
        p2, s2, _, dropped = S.densify_and_prune(
            params, stats, opt, jax.random.PRNGKey(3),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        assert int(dropped) == 0
        assert int(s2.valid.sum()) == 64  # each parent -> 2 children
        # children scale divided by 1.6
        sc = np.asarray(p2.scaling)[np.asarray(s2.valid)]
        np.testing.assert_allclose(sc, -np.log(1.6), atol=1e-5)

    def test_prune_low_opacity(self):
        params, stats = make_splats()
        op = np.asarray(params.opacity).copy()
        op[:10] = -10.0  # sigmoid ~ 0
        params = dataclasses.replace(params, opacity=jnp.asarray(op))
        opt = S.adam_init(params)
        p2, s2, _, _ = S.densify_and_prune(
            params, stats, opt, jax.random.PRNGKey(0),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        assert int(s2.valid.sum()) == 54

    def test_capacity_overflow_reported(self):
        params, stats = make_splats(n=64, cap=80)
        params = dataclasses.replace(
            params, scaling=jnp.full_like(params.scaling, -8.0))
        opt = S.adam_init(params)
        stats = self._stats_with_grads(stats, 1.0, 64)
        _, s2, _, dropped = S.densify_and_prune(
            params, stats, opt, jax.random.PRNGKey(0),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        assert int(dropped) == 48  # 128 wanted, 80 fit
        assert int(s2.valid.sum()) == 80

    def test_adam_state_surgery(self):
        params, stats = make_splats()
        opt = S.adam_init(params)
        # fill mu with marker values
        opt = S.AdamState(
            count=opt.count,
            mu=jax.tree.map(lambda a: jnp.ones_like(a) * 7.0, opt.mu),
            nu=jax.tree.map(lambda a: jnp.ones_like(a) * 3.0, opt.nu))
        stats2 = self._stats_with_grads(stats, 1e-6, 64)
        _, s2, opt2, _ = S.densify_and_prune(
            params, stats2, opt, jax.random.PRNGKey(0),
            grad_threshold=2e-4, min_opacity=0.005, extent=4.0,
            max_screen_size=0.0)
        mu = np.asarray(opt2.mu.xyz)
        v = np.asarray(s2.valid)
        np.testing.assert_allclose(mu[v], 7.0)   # survivors keep state
        np.testing.assert_allclose(mu[~v], 0.0)  # padding zeroed


class TestStatsUpdates:
    def test_add_densification_stats(self):
        _, stats = make_splats(n=8, cap=8)
        g = np.zeros((8, 2), np.float32)
        g[0] = [3.0, 4.0]
        radii = np.zeros(8, np.int32)
        radii[0] = 5
        s2 = S.add_densification_stats(stats, jnp.asarray(g), jnp.asarray(radii))
        np.testing.assert_allclose(float(s2.xyz_gradient_accum[0]), 5.0)
        np.testing.assert_allclose(float(s2.denom[0]), 1.0)
        np.testing.assert_allclose(float(s2.denom[1]), 0.0)

    def test_subsampled_idx_path(self):
        _, stats = make_splats(n=8, cap=8)
        idx = jnp.asarray([5, 2], jnp.int32)
        g = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
        radii = jnp.asarray([1, 1], jnp.int32)
        s2 = S.add_densification_stats(stats, g, radii, idx=idx)
        np.testing.assert_allclose(float(s2.xyz_gradient_accum[5]), 1.0)
        np.testing.assert_allclose(float(s2.xyz_gradient_accum[2]), 2.0)
        s3 = S.update_max_radii(stats, jnp.asarray([9, 4], jnp.int32), idx=idx)
        np.testing.assert_allclose(float(s3.max_radii2d[5]), 9.0)


class TestPlyIO:
    def test_roundtrip(self, tmp_path):
        params, stats = make_splats(n=16, cap=16, sh_degree=2)
        path = str(tmp_path / "pc" / "point_cloud.ply")
        S.save_ply(path, params, np.asarray(stats.valid))
        p2, s2, deg = S.load_ply(path)
        assert deg == 2
        np.testing.assert_allclose(np.asarray(p2.xyz), np.asarray(params.xyz),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2.features_rest),
                                   np.asarray(params.features_rest), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2.rotation),
                                   np.asarray(params.rotation), atol=1e-6)

    def test_header_attribute_order(self, tmp_path):
        params, stats = make_splats(n=4, cap=4, sh_degree=1)
        path = str(tmp_path / "pc.ply")
        S.save_ply(path, params, np.asarray(stats.valid))
        header = open(path, "rb").read(2000).decode("ascii", errors="ignore")
        # reference layout order (gaussian_model.py:153-165)
        assert header.index("property float x") < header.index("f_dc_0")
        assert header.index("f_dc_2") < header.index("f_rest_0")
        assert header.index("f_rest_8") < header.index("property float opacity")
        assert header.index("opacity") < header.index("scale_0")
        assert header.index("scale_2") < header.index("rot_0")

    def test_pointcloud_roundtrip(self, tmp_path):
        from splatfields_tpu.data import ply as plyio
        rng = np.random.RandomState(0)
        pts = rng.randn(32, 3).astype(np.float32)
        cols = rng.rand(32, 3).astype(np.float32)
        path = str(tmp_path / "pts.ply")
        plyio.store_pointcloud(path, pts, cols)
        p, c, _ = plyio.fetch_pointcloud(path)
        np.testing.assert_allclose(p, pts, atol=1e-6)
        np.testing.assert_allclose(c, cols, atol=1 / 255.0)
