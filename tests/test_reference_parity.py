"""Direct numeric parity vs the reference torch modules (VERDICT item 9).

These tests import the reference's own ``utils/resfields.py`` and
``utils/rigid_utils.py`` (importable with the CPU torch in this image —
no diffusers/mmgen needed), transplant the torch parameters into our JAX
modules, and assert the outputs agree. SURVEY hard-part 4: parity bugs in
these layers silently cost PSNR, so they get an end-to-end oracle rather
than a re-derived formula.
"""
import sys

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
    for name in ("weights_t", "matrix_t"):
        if hasattr(ref_lin, name):
            p[name] = np.asarray(getattr(ref_lin, name).detach().numpy())
    return p


CASES = [
    # (compression, mode, rank, capacity)
    ("vm", "lookup", 10, 8),
    ("vm", "interpolation", 10, 8),
    ("vm_cum", "lookup", 10, 8),
    ("vm_noweight", "lookup", 10, 8),
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
            for name in ("weights_t", "matrix_t"):
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
