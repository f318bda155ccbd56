"""Coverage for the lambda-loss paths not exercised by the e2e runs:
mask, depth SSIM/L1, Moran (corr), norm variants, opacity prior."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from splatfields_tpu import config as cfg_lib
from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from tests.test_raster import make_scene


def build_batch(s, v=1, with_depth=True):
    h, w = s["height"], s["width"]
    rng = np.random.RandomState(0)
    return {
        "viewmatrix": jnp.asarray(np.stack([s["viewmatrix"]] * v)),
        "projmatrix": jnp.asarray(np.stack([s["projmatrix"]] * v)),
        "campos": jnp.asarray(np.stack([s["campos"]] * v)),
        "tanfovx": jnp.full((v,), s["tanfovx"], jnp.float32),
        "tanfovy": jnp.full((v,), s["tanfovy"], jnp.float32),
        "fid": jnp.zeros((), jnp.float32),
        "image": jnp.asarray(rng.rand(v, 3, h, w).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(v, 1, h, w) > 0.5).astype(np.float32)),
        "depth": jnp.asarray(
            (rng.rand(v, h, w) * 4 + 1).astype(np.float32)) if with_depth
        else jnp.zeros((v, 1, 1)),
        "bg": jnp.ones(3, jnp.float32),
    }


def run_step(opt_cfg, n=128, w=32, h=32, batch_extra=None):
    s = make_scene(n=n, width=w, height=h)
    params, stats = splats_lib.create_from_pcd(
        s["means3d"], np.abs(s["colors_precomp"]), 0, capacity=n)
    splat_opt = splats_lib.adam_init(params)
    pipe = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
    step = train_lib.make_train_step(
        None, opt_cfg, pipe, w, h, num_views=1, field_mode=False,
        n_frames=0, sh_degree=0)
    lrs = splats_lib.splat_lr_tree(1e-4, 1e-3, 0.05, 1e-3, 1e-3)
    batch = build_batch(s)
    if batch_extra:
        batch.update(batch_extra)
    out = step(params, stats, splat_opt, {"params": {}},
               splats_lib.adam_init({}), batch, lrs,
               jnp.asarray(0.0), jax.random.PRNGKey(0))
    return out[5]


class TestLossPaths:
    def test_mask_and_opacity_losses(self):
        opt = cfg_lib.OptimizationConfig(lambda_mask=0.1, lambda_opacity=0.05)
        res = run_step(opt)
        assert np.isfinite(float(res.loss))
        assert "mask" in res.loss_dict and "opacity" in res.loss_dict
        assert float(res.loss_dict["mask"]) > 0

    def test_depth_losses(self):
        opt = cfg_lib.OptimizationConfig(
            lambda_mask=0.0, lambda_depth=0.1, lambda_depthl1=0.1)
        res = run_step(opt)
        assert "depth" in res.loss_dict and "depthl1" in res.loss_dict
        assert np.isfinite(float(res.loss_dict["depth"]))
        assert float(res.loss_dict["depthl1"]) > 0

    def test_moran_corr_loss(self):
        opt = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_corr=0.01)
        res = run_step(opt, n=96)
        assert np.isfinite(float(res.loss))

    def test_moran_corr_interval_gate(self):
        """--corr_interval k: gated-off steps equal the no-corr loss;
        gated-on steps add k x the every-step corr term."""
        base = run_step(cfg_lib.OptimizationConfig(lambda_mask=0.0), n=96)
        every = run_step(cfg_lib.OptimizationConfig(
            lambda_mask=0.0, lambda_corr=0.01), n=96)
        opt = cfg_lib.OptimizationConfig(
            lambda_mask=0.0, lambda_corr=0.01, corr_interval=4)
        off = run_step(opt, n=96,
                       batch_extra={"corr_gate": jnp.zeros((), jnp.float32)})
        on = run_step(opt, n=96,
                      batch_extra={"corr_gate": jnp.ones((), jnp.float32)})
        corr_term = float(every.loss) - float(base.loss)
        assert corr_term > 0
        np.testing.assert_allclose(float(off.loss), float(base.loss),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(on.loss) - float(base.loss),
                                   4.0 * corr_term, rtol=1e-4)

    def test_lambda_gradient_passthrough(self):
        """lambda_gradient consumes attrs['gradient_error'] once per step
        (reference train.py:247-250); absent key => exact no-op."""
        import collections
        Out = collections.namedtuple("Out", "color alpha depth n_dropped")
        h = w = 8
        rng = np.random.RandomState(1)
        out = Out(color=jnp.asarray(rng.rand(3, h, w).astype(np.float32)),
                  alpha=jnp.zeros((1, h, w)), depth=jnp.zeros((1, h, w)),
                  n_dropped=jnp.zeros((), jnp.int32))
        batch = {"image": jnp.asarray(rng.rand(1, 3, h, w).astype(np.float32))}
        valid = jnp.ones((4,), bool)
        attrs = {"means3d": jnp.zeros((4, 3)), "opacity": jnp.ones((4,))}
        opt = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_gradient=0.5)
        base, _ = train_lib.compute_losses([out], batch, attrs, opt, valid)
        attrs_g = dict(attrs, gradient_error=jnp.asarray(0.25, jnp.float32))
        lossg, aux = train_lib.compute_losses([out], batch, attrs_g, opt,
                                              valid)
        np.testing.assert_allclose(float(lossg) - float(base), 0.5 * 0.25,
                                   rtol=1e-6)
        assert float(aux["gradient"]) == 0.25
        # lambda_gradient == 0 ignores the key (reference guard on both)
        opt0 = cfg_lib.OptimizationConfig(lambda_mask=0.0)
        loss0, aux0 = train_lib.compute_losses([out], batch, attrs_g, opt0,
                                               valid)
        np.testing.assert_allclose(float(loss0), float(base), rtol=1e-7)
        assert "gradient" not in aux0

    def test_norm_losses(self):
        opt = cfg_lib.OptimizationConfig(
            lambda_mask=0.0, lambda_norm=0.01, lambda_norm_mean=0.01)
        res = run_step(opt)
        assert np.isfinite(float(res.loss))

    def test_n_splats_subsampling(self):
        """Field mode with n_splats subsampling (reference train.py:56-62)."""
        from splatfields_tpu.models.deform_model import DeformModel
        s = make_scene(n=128, width=32, height=32)
        params, stats = splats_lib.create_from_pcd(
            s["means3d"], np.abs(s["colors_precomp"]), 0, capacity=128)
        splat_opt = splats_lib.adam_init(params)
        hidden = cfg_lib.HiddenConfig(encoder_type="none",
                                      composition_rank=0, n_frames=0)
        deform = DeformModel(hidden, radius=1.0)
        opt = cfg_lib.OptimizationConfig(lambda_mask=0.0)
        pipe = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
        step = train_lib.make_train_step(
            deform.net, opt, pipe, 32, 32, num_views=1, field_mode=True,
            n_frames=0, sh_degree=0, n_splats=64)
        lrs = splats_lib.splat_lr_tree(1e-4, 1e-3, 0.05, 1e-3, 1e-3)
        out = step(params, stats, splat_opt, deform.variables,
                   deform.opt_state, build_batch(s), lrs,
                   jnp.asarray(1e-3), jax.random.PRNGKey(0))
        res = out[5]
        assert res.radii.shape == (64,)          # subsampled render
        assert np.isfinite(float(res.loss))
        # stats scattered back into full capacity
        s2 = out[1]
        assert s2.denom.shape == (128,)
        assert float(s2.denom.sum()) > 0


class TestFieldVariantsInStep:
    def _field_step(self, hidden_kw, n_frames=0, fid=0.0):
        from splatfields_tpu.models.deform_model import DeformModel
        s = make_scene(n=96, width=32, height=32)
        params, stats = splats_lib.create_from_pcd(
            s["means3d"], np.abs(s["colors_precomp"]), 0, capacity=96)
        splat_opt = splats_lib.adam_init(params)
        hidden = cfg_lib.HiddenConfig(composition_rank=0, n_frames=n_frames,
                                      **hidden_kw)
        deform = DeformModel(hidden, radius=1.0)
        opt = cfg_lib.OptimizationConfig(lambda_mask=0.0)
        pipe = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
        step = train_lib.make_train_step(
            deform.net, opt, pipe, 32, 32, num_views=1, field_mode=True,
            n_frames=n_frames, sh_degree=0)
        lrs = splats_lib.splat_lr_tree(1e-4, 1e-3, 0.05, 1e-3, 1e-3)
        batch = build_batch(s)
        batch["fid"] = jnp.asarray(fid, jnp.float32)
        out = step(params, stats, splat_opt, deform.variables,
                   deform.opt_state, batch, lrs, jnp.asarray(1e-3),
                   jax.random.PRNGKey(0))
        return out[5]

    def test_view_dep_rgb_in_step(self):
        res = self._field_step({"encoder_type": "none",
                                "use_view_dep_rgb": True})
        assert np.isfinite(float(res.loss))

    def test_geo_model_disable_pts_in_step(self):
        res = self._field_step({"encoder_type": "VarTriPlaneEncoder",
                                "encoder_args": {"noise_res": 4},
                                "geo_model_disable_pts": True})
        assert np.isfinite(float(res.loss))

    def test_per_frame_strategy_dynamic_step(self):
        res = self._field_step({"encoder_type": "VarTriPlaneEncoder",
                                "encoder_args": {"noise_res": 4},
                                "layer_strategy": "per_frame",
                                "flow_model": "se3"},
                               n_frames=3, fid=0.5)
        assert np.isfinite(float(res.loss))


class TestScannedStep:
    """make_scanned_train_step: k scanned steps == k sequential jitted
    steps bit-for-bit (same math, one dispatch — VERDICT r4 item 4)."""

    def _setup(self, field_mode, n=96, w=32, h=32, k=3):
        s = make_scene(n=n, width=w, height=h)
        params, stats = splats_lib.create_from_pcd(
            s["means3d"], np.abs(s["colors_precomp"]), 0, capacity=n)
        pipe = cfg_lib.PipelineConfig(tile_cap=64, k_chunk=32)
        opt = cfg_lib.OptimizationConfig(lambda_norm=0.01)
        net, fv, fo = None, {"params": {}}, splats_lib.adam_init({})
        if field_mode:
            from splatfields_tpu.models.deform_model import DeformModel
            hidden = cfg_lib.HiddenConfig(
                encoder_type="VarTriPlaneEncoder",
                encoder_args={"noise_res": 4}, composition_rank=0,
                n_frames=0)
            deform = DeformModel(hidden, radius=1.0)
            net, fv, fo = deform.net, deform.variables, deform.opt_state
        # k distinct single-view batches
        rngs = [build_batch(s) for _ in range(k)]
        for i, b in enumerate(rngs):
            b["image"] = b["image"] * (0.3 + 0.2 * i)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rngs)
        lrs = splats_lib.splat_lr_tree(1e-4, 1e-3, 0.05, 1e-3, 1e-3)
        return (s, params, stats, pipe, opt, net, fv, fo, rngs, stacked,
                lrs, k, w, h)

    def _run_pair(self, field_mode):
        (s, params, stats, pipe, opt, net, fv, fo, batches, stacked, lrs,
         k, w, h) = self._setup(field_mode)
        flr = jnp.asarray(1e-3 if field_mode else 0.0, jnp.float32)
        key = jax.random.PRNGKey(7)

        # sequential reference (fresh state copies: steps donate buffers)
        cp = lambda t: jax.tree.map(jnp.array, t)
        sp, st, so = cp(params), cp(stats), splats_lib.adam_init(params)
        fvars, fopt = cp(fv), cp(fo)
        step = train_lib.make_train_step(
            net, opt, pipe, w, h, num_views=1, field_mode=field_mode,
            n_frames=0, sh_degree=0)
        seq_losses, kk = [], key
        for b in batches:
            sp, st, so, fp, fopt, out, kk = step(
                sp, st, so, fvars, fopt, b, lrs, flr, kk)
            fvars = dict(fvars, params=fp)
            seq_losses.append(float(out.loss))

        # scanned (stacked per-step lrs — identical values here)
        sp2, st2, so2 = cp(params), cp(stats), splats_lib.adam_init(params)
        sstep = train_lib.make_scanned_train_step(
            net, opt, pipe, w, h, num_views=1, field_mode=field_mode,
            n_frames=0, sh_degree=0, k=k)
        lrs_k = jax.tree.map(lambda x: jnp.broadcast_to(x, (k,)), lrs)
        flr_k = jnp.broadcast_to(flr, (k,))
        sp2, st2, so2, fp2, fo2, losses, l1s, aux, _ = sstep(
            sp2, st2, so2, cp(fv), cp(fo), stacked, lrs_k, flr_k, key)
        assert all(v.shape[0] == k for v in jax.tree.leaves(aux))

        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(seq_losses), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sp2.xyz), np.asarray(sp.xyz), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(st2.denom), np.asarray(st.denom), rtol=1e-6)
        if field_mode:
            a = jax.tree.leaves(fp2)[0]
            b = jax.tree.leaves(fvars["params"])[0]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_static_scan_equals_sequential(self):
        self._run_pair(field_mode=False)

    def test_field_scan_equals_sequential(self):
        self._run_pair(field_mode=True)
