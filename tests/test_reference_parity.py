"""Direct numeric parity vs the reference torch modules (VERDICT item 9).

These tests import the reference's own ``utils/resfields.py`` and
``utils/rigid_utils.py`` (importable with the CPU torch in this image —
no diffusers/mmgen needed), transplant the torch parameters into our JAX
modules, and assert the outputs agree. SURVEY hard-part 4: parity bugs in
these layers silently cost PSNR, so they get an end-to-end oracle rather
than a re-derived formula.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from utils import resfields as ref_resfields  # noqa: E402
from utils import rigid_utils as ref_rigid  # noqa: E402

from splatfields_tpu.models.resfields import ResFieldLinear  # noqa: E402
from splatfields_tpu.utils import transforms  # noqa: E402


def _transplant(ref_lin, jax_params):
    """torch Linear state -> our flax param dict (weight stored [in, out])."""
    p = dict(jax_params)
    p["weight"] = np.asarray(
        ref_lin.weight.detach().numpy().T)  # [out,in] -> [in,out]
    p["bias"] = np.asarray(ref_lin.bias.detach().numpy())
    for name in ("weights_t", "matrix_t", "attention_weight",
                 "chunk_weights"):
        if hasattr(ref_lin, name):
            p[name] = np.asarray(getattr(ref_lin, name).detach().numpy())
    return p


CASES = [
    # (compression, mode, rank, capacity)
    ("vm", "lookup", 10, 8),
    ("vm", "interpolation", 10, 8),
    ("vm_cum", "lookup", 10, 8),
    ("vm_cum_mat", "lookup", 10, 8),
    ("vm_noweight", "lookup", 10, 8),
    ("vm_attention", "lookup", 10, 8),
    ("mm_tensor", "lookup", 10, 8),
    ("loe", "interpolation", 5, 8),
    ("none", "lookup", 10, 8),
    ("none_cum", "lookup", 10, 8),
]


class TestResFieldLinearParity:
    @pytest.mark.parametrize("compression,mode,rank,capacity", CASES)
    def test_forward_matches_reference(self, compression, mode, rank,
                                       capacity):
        torch.manual_seed(0)
        fin, fout, n = 12, 7, 33
        ref = ref_resfields.Linear(
            fin, fout, rank=rank, capacity=capacity, mode=mode,
            compression=compression).eval()
        # give the zero/near-zero-initialized temporal params real values
        with torch.no_grad():
            for name in ("weights_t", "matrix_t", "attention_weight"):
                if hasattr(ref, name):
                    getattr(ref, name).copy_(
                        0.1 * torch.randn_like(getattr(ref, name)))

        x = torch.randn(n, fin)
        frame_id = 5
        if mode == "interpolation":
            tvals = torch.linspace(-1.2, 1.2, n)  # includes border clamp
            # reference batches per-time along dim 0: [N, S, F_in] + time [N]
            with torch.no_grad():
                want = ref(x[:, None], input_time=tvals).squeeze(1).numpy()
        else:
            with torch.no_grad():
                want = ref(x[None], frame_id=frame_id).squeeze(0).numpy()

        mod = ResFieldLinear(in_features=fin, out_features=fout, rank=rank,
                             capacity=capacity, mode=mode,
                             compression=compression)
        import jax
        import jax.numpy as jnp
        if mode == "interpolation":
            init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                            input_time=jnp.zeros((n,)))
        else:
            init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                            frame_id=0)
        params = _transplant(ref, init["params"])
        if mode == "interpolation":
            got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                            input_time=jnp.asarray(tvals.numpy()))
        else:
            got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                            frame_id=jnp.asarray(frame_id))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("strategy", ["shared", "delta", "both"])
    def test_chunked_vm_matches_reference(self, strategy):
        """compression='vm' + chunk_size: per-chunk base weights and/or
        per-chunk matrix_t (reference resfields.py:61-74,197-224).

        Reference shape quirk for shared/both: ``chunk_weights`` makes
        ``weight`` 3D ([C, F_out, F_in]), so ``delta_w.permute(1,0).view(-1,
        *weight.shape)`` yields [1, C, F_out, F_in], ``mat[0]`` is taken and
        the ``frame_id`` lookup is SKIPPED (resfields.py:294-300) — upstream
        returns a [C, S, F_out] all-frames batch. We implement the evident
        intent (select the frame); parity is row ``frame_id`` of upstream's
        batched output."""
        torch.manual_seed(3)
        fin, fout, n = 11, 6, 21
        rank, capacity, chunk = 4, 12, 3
        ref = ref_resfields.Linear(
            fin, fout, rank=rank, capacity=capacity, mode="lookup",
            compression="vm", chunk_size=chunk,
            chunk_strategy=strategy).eval()
        with torch.no_grad():
            for name in ("weights_t", "matrix_t", "chunk_weights"):
                if hasattr(ref, name):
                    getattr(ref, name).copy_(
                        0.1 * torch.randn_like(getattr(ref, name)))
        x = torch.randn(n, fin)
        import jax
        import jax.numpy as jnp
        mod = ResFieldLinear(in_features=fin, out_features=fout, rank=rank,
                             capacity=capacity, mode="lookup",
                             compression="vm", chunk_size=chunk,
                             chunk_strategy=strategy)
        init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                        frame_id=0)
        params = _transplant(ref, init["params"])
        for frame_id in (0, 5, capacity - 1):  # spans several chunks
            with torch.no_grad():
                want = ref(x[None], frame_id=frame_id).numpy()
            if strategy in ("shared", "both"):
                # upstream's [C, S, F_out] all-frames batch (see docstring)
                assert want.shape == (capacity, n, fout)
                want = want[frame_id]
            else:
                want = want.squeeze(0)
            got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                            frame_id=jnp.asarray(frame_id))
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=2e-5, atol=2e-5)

    def test_lora3_matches_reference(self):
        """compression='lora_3': trilinear border-padded weight grids +
        shared linear (reference resfields.py:345-371)."""
        torch.manual_seed(4)
        fin, fout, n = 7, 5, 29
        rank, capacity = 3, 4
        ref = ref_resfields.Linear(
            fin, fout, rank=rank, capacity=capacity,
            compression="lora_3").eval()
        with torch.no_grad():
            ref.weights_t.copy_(0.1 * torch.randn_like(ref.weights_t))
        x = torch.randn(n, fin)
        coords = torch.rand(n, 3) * 2.6 - 1.3  # includes border clamps
        with torch.no_grad():
            want = ref(x[None], coordinates=coords[None]).squeeze(0).numpy()
        import jax
        import jax.numpy as jnp
        mod = ResFieldLinear(in_features=fin, out_features=fout, rank=rank,
                             capacity=capacity, compression="lora_3")
        init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                        coordinates=jnp.asarray(coords.numpy()))
        params = _transplant(ref, init["params"])
        got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                        coordinates=jnp.asarray(coords.numpy()))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)

    def test_ignore_residuals_and_lock_weights(self):
        """ignore_residuals routes to the plain linear (reference :388-389);
        lock_weights detaches the base weight in the delta path (:373-376)."""
        torch.manual_seed(5)
        fin, fout, n = 8, 4, 13
        ref = ref_resfields.Linear(fin, fout, rank=3, capacity=6,
                                   ignore_residuals=True).eval()
        x = torch.randn(n, fin)
        with torch.no_grad():
            want = ref(x[None], frame_id=2).squeeze(0).numpy()
        import jax
        import jax.numpy as jnp
        mod = ResFieldLinear(in_features=fin, out_features=fout, rank=3,
                             capacity=6, ignore_residuals=True)
        init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                        frame_id=2)
        params = _transplant(ref, init["params"])
        got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                        frame_id=jnp.asarray(2))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)
        # lock_weights: the base weight reaches the output ONLY through
        # _get_weight() (reference :373-376), which detaches it — so its
        # grad is exactly zero while matrix_t/weights_t still train.
        # Verify grad-parity against torch directly.
        refl = ref_resfields.Linear(fin, fout, rank=3, capacity=6,
                                    lock_weights=True)
        with torch.no_grad():
            for nm in ("weights_t", "matrix_t"):
                getattr(refl, nm).copy_(
                    0.1 * torch.randn_like(getattr(refl, nm)))
        refl(x[None], frame_id=2).sum().backward()
        assert refl.weight.grad is None  # detached everywhere

        mod_lock = ResFieldLinear(in_features=fin, out_features=fout,
                                  rank=3, capacity=6, lock_weights=True)
        xj = jnp.asarray(x.numpy())
        initl = mod_lock.init(jax.random.PRNGKey(1), xj, frame_id=2)
        params_l = _transplant(refl, initl["params"])

        def loss(p):
            return jnp.sum(mod_lock.apply({"params": p}, xj, frame_id=2))

        g = jax.grad(loss)(params_l)
        np.testing.assert_allclose(np.asarray(g["weight"]),
                                   np.zeros((fin, fout), np.float32))
        np.testing.assert_allclose(
            np.asarray(g["matrix_t"]), refl.matrix_t.grad.numpy(),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g["weights_t"]), refl.weights_t.grad.numpy(),
            rtol=1e-4, atol=1e-5)

    def test_rank0_matches_plain_linear(self):
        torch.manual_seed(1)
        fin, fout, n = 9, 5, 17
        ref = ref_resfields.Linear(fin, fout, rank=0, capacity=0).eval()
        x = torch.randn(n, fin)
        with torch.no_grad():
            want = ref(x[None], frame_id=2).squeeze(0).numpy()
        mod = ResFieldLinear(in_features=fin, out_features=fout,
                             rank=0, capacity=0)
        import jax
        import jax.numpy as jnp
        init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
        params = _transplant(ref, init["params"])
        got = mod.apply({"params": params}, jnp.asarray(x.numpy()),
                        frame_id=jnp.asarray(2))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)


class TestRigidUtilsParity:
    def setup_method(self, _):
        torch.manual_seed(2)
        self.w = torch.randn(24, 3)
        self.w = self.w / self.w.norm(dim=-1, keepdim=True)
        self.v = torch.randn(24, 3)
        self.theta = torch.rand(24, 1) * 2 * np.pi

    def test_skew(self):
        want = ref_rigid.skew(self.w).numpy()
        got = np.asarray(transforms.skew(self.w.numpy()))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_exp_so3(self):
        want = ref_rigid.exp_so3(self.w, self.theta).numpy()
        got = np.asarray(transforms.exp_so3(self.w.numpy(),
                                            self.theta.numpy()))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_exp_se3(self):
        S = torch.cat([self.w, self.v], dim=-1)
        want = ref_rigid.exp_se3(S, self.theta).numpy()
        got = np.asarray(transforms.exp_se3(S.numpy(), self.theta.numpy()))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_scaled_exp_se3(self):
        S = torch.cat([self.w, self.v], dim=-1)
        scale = torch.rand(24, 1) + 0.5
        want = ref_rigid.scaled_exp_se3(S, self.theta, scale).numpy()
        got = np.asarray(transforms.scaled_exp_se3(
            S.numpy(), self.theta.numpy(), scale.numpy()))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_homogenous_roundtrip(self):
        v = torch.randn(10, 3)
        want = ref_rigid.to_homogenous(v).numpy()
        got = np.asarray(transforms.to_homogeneous(v.numpy()))
        np.testing.assert_allclose(got, want, atol=1e-7)
        wantb = ref_rigid.from_homogenous(torch.from_numpy(want)).numpy()
        gotb = np.asarray(transforms.from_homogeneous(got))
        np.testing.assert_allclose(gotb, wantb, atol=1e-7)


# ---------------------------------------------------------------------------
# Full SplatFields net transplant (pure-MLP configs; the CNN encoder path
# needs diffusers and is covered by tests/test_fields.py goldens instead)
# ---------------------------------------------------------------------------

def _import_ref_time_utils():
    """Import /root/reference/utils/time_utils.py with its unavailable
    heavy deps (mmgen/diffusers/mmcv/plyfile chains) stubbed out. The
    stubs are only touched at class-DEFINITION time (registry decorators,
    dummy base classes) — the pure-MLP SplatFields configuration never
    instantiates them."""
    import importlib.util
    import types
    import torch.nn as tnn

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        # auto-create dummy torch Module subclasses for anything else —
        # but NEVER for dunder lookups (__file__, __path__, ...): tools
        # like inspect.getmodule probe those on every sys.modules entry,
        # and a fake class there breaks unrelated tests in-process
        def _getattr(key, _m=mod):
            if key.startswith("__") and key.endswith("__"):
                raise AttributeError(key)
            cls = type(key, (tnn.Module,), {})
            setattr(_m, key, cls)
            return cls
        mod.__getattr__ = _getattr
        sys.modules[name] = mod
        return mod

    _stub("mmgen")
    _stub("mmgen.models", build_module=lambda cfg, *a, **k: None,
          builder=None)
    _stub("mmgen.models.builder", MODULES=_Registry(),
          build_module=lambda cfg, *a, **k: None)
    _stub("mmcv")
    _stub("mmcv.cnn")
    _stub("mmcv.cnn.utils", constant_init=lambda *a, **k: None,
          kaiming_init=lambda *a, **k: None)
    _stub("diffusers")
    _stub("diffusers.models")
    _stub("diffusers.models.modeling_utils")
    _stub("diffusers.models.resnet")
    _stub("diffusers.models.attention_processor")
    _stub("diffusers.models.vae", is_torch_version=lambda *a: False,
          get_activation=lambda name: tnn.SiLU())
    _stub("diffusers.models.lora")
    _stub("diffusers.utils", logging=types.SimpleNamespace(
        get_logger=lambda *a, **k: types.SimpleNamespace(
            warning=lambda *a, **k: None)))

    # a bare 'scene' package so scene.time_decoders/tripFields import
    # WITHOUT executing the real scene/__init__.py (plyfile, CUDA knn, ...)
    pkg = types.ModuleType("scene")
    pkg.__path__ = ["/root/reference/scene"]
    sys.modules.setdefault("scene", pkg)

    spec = importlib.util.spec_from_file_location(
        "ref_time_utils", "/root/reference/utils/time_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _transplant_net(ref_sd, ours):
    """torch SplatFields state_dict -> our flax param tree (in place on a
    copied tree). torch Linear weights are [out, in]; ours are [in, out]."""
    import copy
    out = copy.deepcopy(jax.tree.map(np.asarray, ours))

    def put(dst, key, arr):
        assert dst[key].shape == arr.shape, (key, dst[key].shape, arr.shape)
        dst[key] = arr

    for name, tree in out.items():
        if name == "mlp_flow_head":
            for branch, p in tree.items():
                put(p, "kernel",
                    ref_sd[f"{name}.{branch}.weight"].numpy().T)
                put(p, "bias", ref_sd[f"{name}.{branch}.bias"].numpy())
            continue
        for i_key, p in tree.items():
            i = int(i_key.split("_")[1])
            put(p, "weight", ref_sd[f"{name}.net.{i}.weight"].numpy().T)
            put(p, "bias", ref_sd[f"{name}.net.{i}.bias"].numpy())
            for extra in ("weights_t", "matrix_t"):
                if f"{name}.net.{i}.{extra}" in ref_sd:
                    put(p, extra, ref_sd[f"{name}.net.{i}.{extra}"].numpy())
    return out


class TestSplatFieldsNetParity:
    """Weight-transplant parity of the WHOLE pure-MLP SplatFields net
    (embedders + deform/rgb/scale/opacity/rotation heads with the
    default quirky geometry, + ResField ranks and the se3 flow head in
    4-D) against the reference module (SURVEY hard-part 4)."""

    def _run(self, n_frames, rank, flow_model="se3"):
        import jax.numpy as jnp
        from splatfields_tpu.models.splatfields import SplatFields

        ref_tu = _import_ref_time_utils()
        torch.manual_seed(3)
        kwargs = dict(encoder_type="none", composition_rank=rank,
                      flow_model=flow_model)
        ref = ref_tu.SplatFields(radius=1.0, n_frames=n_frames,
                                 **kwargs).eval()
        with torch.no_grad():  # give near-zero temporal params real values
            for pname, p in ref.named_parameters():
                if pname.endswith(("weights_t", "matrix_t")):
                    p.copy_(torch.randn_like(p) * 0.05)

        ours = SplatFields(n_frames=n_frames, radius=1.0,
                           encoder_type="", composition_rank=rank,
                           flow_model=flow_model, fused_pallas="off")
        rng = np.random.RandomState(0)
        xyz = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
        t = None
        t_torch = None
        if n_frames > 0:
            tv = 2.0 / (n_frames - 1)
            t = jnp.full((64, 1), tv, jnp.float32)
            t_torch = torch.full((64, 1), tv)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(xyz), t)
        params = _transplant_net(ref.state_dict(), variables["params"])

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(xyz), t_torch)
        got = ours.apply(dict(variables, params=params), jnp.asarray(xyz), t)

        for key in ("means3D", "rgb", "scales", "opacity", "rotations"):
            np.testing.assert_allclose(
                np.asarray(got[key]), ref_out[key].numpy(),
                atol=2e-5, rtol=1e-4, err_msg=key)
        if n_frames > 0 and flow_model == "offset":
            np.testing.assert_allclose(
                np.asarray(got["flow"]), ref_out["flow"].detach().numpy(),
                atol=2e-5, rtol=1e-4, err_msg="flow")

    def test_static_default_geometry(self):
        self._run(n_frames=0, rank=0)

    def test_dynamic_ranked_se3(self):
        self._run(n_frames=4, rank=2, flow_model="se3")

    def test_dynamic_offset_flow(self):
        self._run(n_frames=4, rank=0, flow_model="offset")


class TestWanderPathParity:
    def test_matches_reference_exactly(self):
        """render_wander_path vs /root/reference/utils/pose_utils.py:67-99
        (defined upstream, reachable from no entry point there)."""
        from utils import pose_utils as ref_pose
        from splatfields_tpu.utils.camera_paths import render_wander_path

        rng = np.random.RandomState(0)
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        t = rng.randn(3).astype(np.float32)

        class V:
            pass

        v = V()
        v.R = q.copy()      # the reference mutates view.R in place
        v.T = t.copy()
        v.FoVy = 0.9
        v.image_height = 400
        want = np.stack([p.numpy() for p in ref_pose.render_wander_path(v)])
        got = render_wander_path(q.copy(), t.copy(), 0.9, 400)
        np.testing.assert_array_equal(got, want)


class TestRodriguesParity:
    """rodrigues_{mat_to_rot,rot_to_mat} vs /root/reference/utils/
    pose_utils.py:24-56 (the file's last unported functions; imported
    nowhere upstream — VERDICT r4 item 7)."""

    def test_rot_to_mat_matches_reference(self):
        from utils import pose_utils as ref_pose
        from splatfields_tpu.utils.camera_paths import rodrigues_rot_to_mat

        rng = np.random.RandomState(1)
        for _ in range(20):
            r = rng.randn(3) * rng.uniform(0.01, 3.0)
            want = ref_pose.rodrigues_rot_to_mat(r)
            got = rodrigues_rot_to_mat(r)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)

    def test_mat_to_rot_matches_reference(self):
        from utils import pose_utils as ref_pose
        from splatfields_tpu.utils.camera_paths import rodrigues_mat_to_rot

        rng = np.random.RandomState(2)
        for _ in range(20):
            q, _ = np.linalg.qr(rng.randn(3, 3))
            if np.linalg.det(q) < 0:
                q[:, 0] = -q[:, 0]
            want = ref_pose.rodrigues_mat_to_rot(q)
            got = rodrigues_mat_to_rot(q)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
        # the small-angle branch (identity: trc2 = 1, 1 - trc2^2 < eps)
        np.testing.assert_allclose(
            rodrigues_mat_to_rot(np.eye(3)),
            ref_pose.rodrigues_mat_to_rot(np.eye(3)), atol=1e-12)

    def test_roundtrip(self):
        from splatfields_tpu.utils.camera_paths import (
            rodrigues_mat_to_rot, rodrigues_rot_to_mat)
        rng = np.random.RandomState(3)
        r = rng.randn(3)
        np.testing.assert_allclose(
            rodrigues_mat_to_rot(rodrigues_rot_to_mat(r)), r, atol=1e-9)


class TestDensityParity:
    """LaplaceDensity / BellDensity vs /root/reference/scene/
    tripFields.py:18-55 (imported by time_utils.py:7 upstream but never
    constructed from any released config — VERDICT r4 item 7)."""

    @pytest.fixture(scope="class")
    def ref_trip(self):
        _import_ref_time_utils()  # installs the mmgen/diffusers/scene stubs
        import importlib
        return importlib.import_module("scene.tripFields")

    def test_laplace_matches_reference(self, ref_trip):
        from splatfields_tpu.models.density import LaplaceDensity

        ref = ref_trip.LaplaceDensity({"beta": 0.1, "beta_min": 1e-4})
        with torch.no_grad():
            ref.beta.data.fill_(0.37)
        sdf = np.linspace(-2.0, 2.0, 41).astype(np.float32)

        ours = LaplaceDensity(beta_init=0.1, beta_min=1e-4)
        variables = {"params": {"beta": jnp.asarray(0.37, jnp.float32)}}

        want = ref(torch.from_numpy(sdf)).detach().numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(sdf)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        inv_want = float(ref.inv_s())
        inv_got = float(ours.apply(variables, method=LaplaceDensity.inv_s))
        np.testing.assert_allclose(inv_got, inv_want, rtol=1e-6)

    def test_laplace_explicit_beta(self, ref_trip):
        from splatfields_tpu.models.density import LaplaceDensity
        sdf = np.linspace(-1.0, 1.0, 17).astype(np.float32)
        ref = ref_trip.LaplaceDensity({})
        want = ref(torch.from_numpy(sdf), beta=torch.tensor(0.05)).numpy()
        ours = LaplaceDensity()
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(sdf))
        got = np.asarray(ours.apply(variables, jnp.asarray(sdf), beta=0.05))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_bell_matches_reference(self, ref_trip):
        from splatfields_tpu.models.density import BellDensity

        ref = ref_trip.BellDensity({})
        with torch.no_grad():
            ref.lamb.data.fill_(1.3)
            ref.gamma.data.fill_(0.8)
        sdf = np.linspace(-3.0, 3.0, 31).astype(np.float32)

        ours = BellDensity()
        variables = {"params": {"lamb": jnp.asarray(1.3, jnp.float32),
                                "gamma": jnp.asarray(0.8, jnp.float32)}}
        want = ref(torch.from_numpy(sdf)).detach().numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(sdf)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        inv_got = float(ours.apply(variables, method=BellDensity.inv_s))
        np.testing.assert_allclose(inv_got, float(ref.inv_s()), rtol=1e-6)
