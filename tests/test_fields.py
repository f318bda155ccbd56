"""Field network tests: GeneralMLP quirks, ResFieldLinear math vs the
reference formula, decoder shapes/init, flow heads, full SplatFields."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatfields_tpu.models.decoder import Tensorial2D, TimeVAEDecoder
from splatfields_tpu.models.encoders import (
    HashGridEncoder, NGPMLP, TriPlaneEncoder, VarTriPlaneEncoder)
from splatfields_tpu.models.flow import FlowHead, init_dct_basis
from splatfields_tpu.models.mlp import GeneralMLP, positional_embed
from splatfields_tpu.models.resfields import ResFieldLinear
from splatfields_tpu.models.splatfields import SplatFields


class TestEmbedder:
    def test_dims_and_order(self):
        x = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32))
        out = positional_embed(x, 6)
        assert out.shape == (5, 3 * 13)
        np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(x))
        # first octave: sin(x), cos(x)
        np.testing.assert_allclose(np.asarray(out[:, 3:6]),
                                   np.sin(np.asarray(x)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, 6:9]),
                                   np.cos(np.asarray(x)), atol=1e-6)
        # last octave frequency 2^5
        np.testing.assert_allclose(np.asarray(out[:, -6:-3]),
                                   np.sin(32 * np.asarray(x)), atol=1e-5)

    def test_multires_zero_identity(self):
        x = jnp.ones((4, 7))
        assert positional_embed(x, 0) is x


class TestResFieldLinear:
    def test_rank0_is_plain_linear(self):
        m = ResFieldLinear(in_features=8, out_features=4, rank=0, capacity=0)
        x = jnp.asarray(np.random.RandomState(1).randn(10, 8).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        w = np.asarray(v["params"]["weight"])
        b = np.asarray(v["params"]["bias"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w + b,
                                   atol=1e-5)

    def test_vm_lookup_matches_reference_formula(self):
        m = ResFieldLinear(in_features=6, out_features=5, rank=3, capacity=7)
        x = jnp.asarray(np.random.RandomState(2).randn(10, 6).astype(np.float32))
        v = m.init(jax.random.PRNGKey(1), x, frame_id=jnp.asarray(2))
        y = np.asarray(m.apply(v, x, frame_id=jnp.asarray(2)))
        W = np.asarray(v["params"]["weight"])       # [in, out]
        b = np.asarray(v["params"]["bias"])
        wt = np.asarray(v["params"]["weights_t"])   # [C, R]
        mt = np.asarray(v["params"]["matrix_t"])    # [R, out*in]
        # reference: delta = (w_t[f] @ M).reshape(out, in); y = x (W+d)^T + b
        delta = (wt[2] @ mt).reshape(5, 6)
        expect = np.asarray(x) @ (W + delta.T) + b
        np.testing.assert_allclose(y, expect, atol=1e-5)

    def test_interpolation_mode(self):
        m = ResFieldLinear(in_features=4, out_features=3, rank=2, capacity=5,
                           mode="interpolation")
        x = jnp.ones((6, 4))
        t = jnp.linspace(-1, 1, 6)
        v = m.init(jax.random.PRNGKey(2), x, input_time=t)
        y = m.apply(v, x, input_time=t)
        assert y.shape == (6, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_unknown_compression_raises(self):
        m = ResFieldLinear(in_features=4, out_features=3, rank=2, capacity=5,
                           compression="bogus")
        with pytest.raises(NotImplementedError):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4)))

    def test_loe_lookup_mode_refused(self):
        """Upstream loe+lookup indexes per-SAMPLE weights by frame_id
        (reference resfields.py:293-300) — semantically broken; we refuse
        (ADVICE r4)."""
        m = ResFieldLinear(in_features=4, out_features=3, rank=2, capacity=5,
                           compression="loe", mode="lookup")
        with pytest.raises(NotImplementedError, match="interpolation"):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4)),
                   input_time=jnp.zeros((2,)), frame_id=jnp.asarray(1))

    def test_chunked_vm_interpolation_refused(self):
        """Chunked vm requires integer frame_id (lookup); interpolation
        falls through to a clear error instead of a TypeError (ADVICE r4)."""
        m = ResFieldLinear(in_features=4, out_features=3, rank=2, capacity=8,
                           compression="vm", mode="interpolation",
                           chunk_size=4)
        with pytest.raises(NotImplementedError, match="lookup"):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4)),
                   input_time=jnp.zeros((2,)))

    def test_cp_matches_numpy_oracle(self):
        """cp: delta stack = tensorly cp_to_tensor((lin_w, [f1,f2,f3]))
        (reference resfields.py:345-349) = sum_r w_r f1[:,r] (x) f2[:,r]
        (x) f3[:,r]; tensorly is absent here so oracle it in NumPy."""
        fin, fout, rank, cap, n = 6, 5, 3, 4, 9
        m = ResFieldLinear(in_features=fin, out_features=fout, rank=rank,
                           capacity=cap, compression="cp")
        x = jnp.asarray(np.random.RandomState(0).randn(n, fin),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(7), x, frame_id=0)
        p = jax.tree.map(np.asarray, v["params"])
        frame = 2
        y = np.asarray(m.apply(v, x, frame_id=jnp.asarray(frame)))
        delta_oi = np.einsum(
            "r,r,or,ir->oi", p["lin_w"], p["lin_f1"][frame],
            p["lin_f2"], p["lin_f3"])  # [out, in]
        w_eff = p["weight"] + delta_oi.T  # [in, out]
        expect = np.asarray(x) @ w_eff + p["bias"]
        np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)

    def test_tucker_matches_numpy_oracle(self):
        """tucker: delta stack = core x0 f0 x1 f1 x2 f2 (reference
        resfields.py:350-354), frame row selected."""
        fin, fout, rank, cap, n = 6, 5, 3, 4, 9
        m = ResFieldLinear(in_features=fin, out_features=fout, rank=rank,
                           capacity=cap, compression="tucker")
        x = jnp.asarray(np.random.RandomState(1).randn(n, fin),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(8), x, frame_id=0)
        p = jax.tree.map(np.asarray, v["params"])
        frame = 3
        y = np.asarray(m.apply(v, x, frame_id=jnp.asarray(frame)))
        delta_coi = np.einsum(
            "xyz,cx,oy,iz->coi", p["tucker_core"], p["tucker_f0"],
            p["tucker_f1"], p["tucker_f2"])  # [cap, out, in]
        w_eff = p["weight"] + delta_coi[frame].T
        expect = np.asarray(x) @ w_eff + p["bias"]
        np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)

    def test_resnet_routes_to_plain_linear(self):
        """resnet registers its vec but the forward routes to the plain
        linear (reference resfields.py:150-151,390-392)."""
        m = ResFieldLinear(in_features=4, out_features=3, rank=2,
                           capacity=5, compression="resnet")
        x = jnp.ones((6, 4))
        v = m.init(jax.random.PRNGKey(9), x, frame_id=1)
        p = v["params"]
        assert p["resnet_vec"].shape == (5, 3)
        y = np.asarray(m.apply(v, x, frame_id=jnp.asarray(1)))
        expect = np.asarray(x) @ np.asarray(p["weight"]) + \
            np.asarray(p["bias"])
        np.testing.assert_allclose(y, expect, rtol=1e-6, atol=1e-6)

    def test_lora_ngp_smoke(self):
        """lora_ngp: hash-grid coefficient/bases nets standing in for the
        tinycudann pair (reference resfields.py:96-124,365-371); shape +
        finite grads."""
        m = ResFieldLinear(in_features=4, out_features=3, rank=2,
                           capacity=5, compression="lora_ngp")
        x = jnp.ones((6, 4))
        coords = jnp.asarray(
            np.random.RandomState(2).uniform(-1, 1, (6, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(10), x, coordinates=coords)

        def loss(params):
            return jnp.sum(m.apply({"params": params}, x,
                                   coordinates=coords) ** 2)

        val, g = jax.value_and_grad(loss)(v["params"])
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(leaf)).all()
                   for leaf in jax.tree.leaves(g))


class TestGeneralMLP:
    def test_shapes_with_skips(self):
        m = GeneralMLP(in_features=3, out_features=3, hidden_features=32,
                       num_hidden_layers=6, skips=(3,), multires=6,
                       out_activation="none", act="leaky_relu",
                       composition_rank=0, n_frames=0)
        x = jnp.asarray(np.random.RandomState(3).randn(17, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(3), x)
        y = m.apply(v, x)
        assert y.shape == (17, 3)

    def test_bf16_activation_knob(self, monkeypatch):
        """The production default stores inter-layer activations in bf16
        (models/mlp.py; the suite pins f32 via conftest). The bf16 path
        must return f32 outputs close to the f32 path, and gradients must
        stay finite."""
        m = GeneralMLP(in_features=3, out_features=3, hidden_features=32,
                       num_hidden_layers=4, skips=(2,), multires=6,
                       out_activation="none", act="leaky_relu",
                       composition_rank=0, n_frames=0)
        x = jnp.asarray(
            np.random.RandomState(9).randn(64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(9), x)
        y32 = m.apply(v, x)
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "on")
        y16 = m.apply(v, x)
        assert y16.dtype == jnp.float32
        scale = float(jnp.abs(y32).max()) + 1e-6
        assert float(jnp.abs(y16 - y32).max()) / scale < 3e-2
        g = jax.grad(lambda p: jnp.sum(jnp.tanh(m.apply(p, x))))(v)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(g))

    def test_bf16_auto_default_gates_on_n_frames(self, monkeypatch):
        """SPLATFIELDS_MLP_BF16=auto (the production default): bf16 for
        static fields (n_frames == 0), f32 when n_frames > 0 — the 4D
        path regresses 2.2 dB under bf16 (quality_longrun_4d.json)."""
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "auto")
        x = jnp.asarray(
            np.random.RandomState(5).randn(32, 3).astype(np.float32))

        # static: auto must match the explicit-on (bf16) output
        m0 = GeneralMLP(in_features=3, out_features=3, hidden_features=32,
                        num_hidden_layers=3, skips=(), multires=4,
                        out_activation="none", act="leaky_relu",
                        composition_rank=0, n_frames=0)
        v0 = m0.init(jax.random.PRNGKey(5), x)
        y_auto = m0.apply(v0, x)
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "on")
        y_on = m0.apply(v0, x)
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "off")
        y_off = m0.apply(v0, x)
        np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_on))
        assert float(jnp.abs(y_on - y_off).max()) > 0  # knob is live

        # 4D (n_frames > 0): auto must match the explicit-off (f32) output
        m1 = GeneralMLP(in_features=3, out_features=3, hidden_features=32,
                        num_hidden_layers=3, skips=(), multires=4,
                        out_activation="none", act="leaky_relu",
                        composition_rank=2, n_frames=4)
        fid = jnp.zeros((), jnp.int32)
        v1 = m1.init(jax.random.PRNGKey(6), x, frame_id=fid)
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "auto")
        z_auto = m1.apply(v1, x, frame_id=fid)
        monkeypatch.setenv("SPLATFIELDS_MLP_BF16", "off")
        z_off = m1.apply(v1, x, frame_id=fid)
        np.testing.assert_array_equal(np.asarray(z_auto), np.asarray(z_off))

    def test_feat_concat(self):
        m = GeneralMLP(in_features=3 + 10, out_features=4, hidden_features=16,
                       num_hidden_layers=3, skips=(1,), multires=4,
                       out_activation="sigmoid", act="leaky_relu")
        x = jnp.ones((5, 3))
        feat = jnp.ones((5, 10))
        v = m.init(jax.random.PRNGKey(4), x, xyz_feat=feat)
        y = m.apply(v, x, xyz_feat=feat)
        assert y.shape == (5, 4)
        assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()

    def test_last_layer_leaky_relu_quirk(self):
        # out_activation='none' still passes through leaky_relu: strong
        # negatives are compressed by 0.01 (reference :184-190)
        m = GeneralMLP(in_features=3, out_features=64, hidden_features=64,
                       num_hidden_layers=2, skips=(), multires=0,
                       out_activation="none", act="leaky_relu")
        x = jnp.asarray(np.random.RandomState(5).randn(200, 3).astype(np.float32) * 3)
        v = m.init(jax.random.PRNGKey(5), x)
        y = np.asarray(m.apply(v, x))
        assert y.min() < 0  # leaky, not relu
        assert abs(y.min()) < 0.05 * y.max()  # negatives squashed 100x

    def test_resfield_ranks_on_inner_layers_only(self):
        m = GeneralMLP(in_features=3, out_features=3, hidden_features=16,
                       num_hidden_layers=4, skips=(), multires=2,
                       composition_rank=5, n_frames=9)
        x = jnp.ones((4, 3))
        v = m.init(jax.random.PRNGKey(6), x, frame_id=jnp.asarray(0))
        p = v["params"]
        # net_0 (input), net_1 (created layer 0) and net_5 (output): no
        # temporal params; net_2..net_4: weights_t present
        assert "weights_t" not in p["net_0"]
        assert "weights_t" not in p["net_1"]
        assert "weights_t" in p["net_2"]
        assert "weights_t" in p["net_4"]
        assert "weights_t" not in p["net_5"]

    def test_frame_changes_output_iff_rank(self):
        x = jnp.asarray(np.random.RandomState(9).randn(4, 3).astype(np.float32))
        m = GeneralMLP(in_features=3, out_features=3, hidden_features=16,
                       num_hidden_layers=3, skips=(), multires=2,
                       act="none", composition_rank=4, n_frames=5)
        v = m.init(jax.random.PRNGKey(7), x, frame_id=jnp.asarray(0))
        y0 = np.asarray(m.apply(v, x, frame_id=jnp.asarray(0)))
        y1 = np.asarray(m.apply(v, x, frame_id=jnp.asarray(3)))
        assert np.abs(y0 - y1).max() > 1e-6


class TestDecoder:
    def test_output_shape_8x(self):
        m = TimeVAEDecoder()
        z = jnp.asarray(np.random.RandomState(8).randn(1, 20, 20, 8).astype(np.float32))
        v = m.init(jax.random.PRNGKey(8), z)
        y = m.apply(v, z)
        assert y.shape == (1, 160, 160, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_zero_init_residuals(self):
        m = TimeVAEDecoder()
        z = jnp.ones((1, 8, 8, 8))
        v = m.init(jax.random.PRNGKey(9), z)
        p = v["params"]
        np.testing.assert_allclose(
            np.asarray(p["mid_res0"]["conv2"]["kernel"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(p["mid_attn"]["to_out"]["kernel"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(p["up2_res1"]["conv2"]["kernel"]), 0.0)

    def test_per_frame_strategy(self):
        m = TimeVAEDecoder(n_frames=4, strategy="per_frame",
                           block_out_channels=(32, 32))
        z = jnp.ones((1, 6, 6, 8))
        v = m.init(jax.random.PRNGKey(10), z, frame_id=jnp.asarray(0))
        y0 = np.asarray(m.apply(v, z, frame_id=jnp.asarray(0)))
        y1 = np.asarray(m.apply(v, z, frame_id=jnp.asarray(2)))
        assert y0.shape == (1, 12, 12, 16)
        assert np.abs(y0 - y1).max() > 0  # frame deltas differentiate output

    def test_tensorial2d_frozen_noise(self):
        m = Tensorial2D(noise_res=8)
        v = m.init(jax.random.PRNGKey(11))
        y = m.apply(v, None)
        assert y.shape == (1, 64, 64, 16)
        assert "noise" in v["buffers"]

    @staticmethod
    def _pack_params(packed_tpl, unpacked_list):
        """Transplant N unpacked TimeVAEDecoder param trees into the
        channel-packed layout: conv kernels/biases, GroupNorm scales and
        frame deltas concat along the channel (last) axis; the attention's
        block-diagonal projections stack per pack."""
        res = {}
        for k, v in packed_tpl.items():
            if isinstance(v, dict):
                res[k] = TestDecoder._pack_params(
                    v, [u[k] for u in unpacked_list])
            elif k.startswith("to_") and k.endswith("_kernel"):
                res[k] = np.stack(
                    [np.asarray(u[k[:-7]]["kernel"]) for u in unpacked_list])
            elif k.startswith("to_") and k.endswith("_bias"):
                res[k] = np.stack(
                    [np.asarray(u[k[:-5]]["bias"]) for u in unpacked_list])
            else:
                res[k] = np.concatenate(
                    [np.asarray(u[k]) for u in unpacked_list], axis=-1)
        return res

    @pytest.mark.parametrize("strategy,n_frames", [("none", 0),
                                                   ("per_frame", 3)])
    def test_packed_decoder_matches_unpacked(self, strategy, n_frames):
        """n_packs=3 (SPLATFIELDS_PACKED_CNN lowering) is bit-for-bit the
        same math as 3 independent decoders — grouped convs, scaled
        GroupNorm groups, block-diagonal attention."""
        arch = dict(in_channels=4, out_channels=6,
                    block_out_channels=(8, 8, 8), norm_num_groups=4,
                    strategy=strategy, n_frames=n_frames)
        rng = np.random.RandomState(20)
        subs = [TimeVAEDecoder(**arch) for _ in range(3)]
        zs = [jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
              for _ in range(3)]
        fid = jnp.asarray(1) if n_frames else None
        vs = [m.init(jax.random.PRNGKey(30 + i), z, frame_id=fid)
              for i, (m, z) in enumerate(zip(subs, zs))]
        packed = TimeVAEDecoder(**arch, n_packs=3)
        zp = jnp.concatenate(zs, axis=-1)
        vp = packed.init(jax.random.PRNGKey(40), zp, frame_id=fid)
        pp = self._pack_params(vp["params"], [v["params"] for v in vs])
        yp = np.asarray(packed.apply({"params": pp}, zp, frame_id=fid))
        for g in range(3):
            yg = np.asarray(subs[g].apply(vs[g], zs[g], frame_id=fid))
            np.testing.assert_allclose(
                yp[..., g * 6:(g + 1) * 6], yg, rtol=2e-5, atol=2e-5)

    def test_packed_encoder_knob(self, monkeypatch):
        """SPLATFIELDS_PACKED_CNN=on: same shapes, precomputed-planes path
        identical, finite grads."""
        monkeypatch.setenv("SPLATFIELDS_PACKED_CNN", "on")
        m = VarTriPlaneEncoder(noise_res=6)
        pts = jnp.asarray(
            np.random.RandomState(21).uniform(-1, 1, (5, 3)).astype(
                np.float32))
        v = m.init(jax.random.PRNGKey(22), pts)
        assert "subs_packed" in v["params"]
        y = m.apply(v, pts)
        assert y.shape == (5, 48)
        planes = m.apply(v, method=lambda mod: mod.planes(None))
        assert planes.shape[0] == 3
        y2 = m.apply(v, pts, planes=planes)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

        def loss(params):
            return jnp.sum(m.apply({"params": params,
                                    "buffers": v["buffers"]}, pts) ** 2)

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(leaf)).all()
                   for leaf in jax.tree.leaves(g))


class TestEncoders:
    def test_triplane_out_dim(self):
        m = TriPlaneEncoder(resolution=16, channels=4)
        pts = jnp.asarray(np.random.RandomState(12).uniform(-1, 1, (9, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(12), pts)
        y = m.apply(v, pts)
        assert y.shape == (9, 12)

    def test_var_triplane(self):
        m = VarTriPlaneEncoder(noise_res=6)
        pts = jnp.asarray(np.random.RandomState(13).uniform(-1, 1, (5, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(13), pts)
        y = m.apply(v, pts)
        assert y.shape == (5, 48)
        # precomputed-planes path gives identical output
        planes = m.apply(v, method=lambda mod: mod.planes(None))
        y2 = m.apply(v, pts, planes=planes)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

    def test_hashgrid_interpolates(self):
        m = HashGridEncoder(n_levels=4, log2_hashmap_size=10)
        pts = jnp.asarray(np.random.RandomState(14).rand(20, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(14), pts)
        y = m.apply(v, pts)
        assert y.shape == (20, 8)
        # continuity: nearby points give nearby features
        y2 = m.apply(v, pts + 1e-5)
        assert np.abs(np.asarray(y) - np.asarray(y2)).max() < 1e-3

    def test_hashgrid_sorted_grad_matches_scatter(self, monkeypatch):
        """SPLATFIELDS_NGP_SORTED_GRAD: the sort + Pallas segment-sum
        table VJP equals the XLA scatter VJP (small table, interpret-mode
        kernel on CPU)."""
        enc = HashGridEncoder(n_levels=2, log2_hashmap_size=10)
        pts = jnp.asarray(
            np.random.RandomState(31).rand(50, 3).astype(np.float32))
        monkeypatch.setenv("SPLATFIELDS_NGP_SORTED_GRAD", "off")
        v = enc.init(jax.random.PRNGKey(31), pts)

        def loss(params):
            return jnp.sum(jnp.tanh(enc.apply({"params": params}, pts)))

        g_scatter = jax.grad(loss)(v["params"])
        monkeypatch.setenv("SPLATFIELDS_NGP_SORTED_GRAD", "on")
        g_sorted = jax.grad(loss)(v["params"])
        np.testing.assert_allclose(
            np.asarray(g_sorted["table"]), np.asarray(g_scatter["table"]),
            rtol=1e-5, atol=1e-6)

    def test_ngp_mlp(self):
        m = NGPMLP(out_features=16, n_levels=4, log2_hashmap_size=10)
        pts = jnp.asarray(np.random.RandomState(15).uniform(-1, 1, (7, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(15), pts)
        y = m.apply(v, pts)
        assert y.shape == (7, 16)


class TestFlowHead:
    @pytest.mark.parametrize("fm", ["offset", "se3", "se3Affine", "se3Scaled",
                                     "affine", "dct", "dct_siren"])
    def test_variants(self, fm):
        m = FlowHead(width=16, flow_model=fm, num_basis=4, n_frames=8)
        hidden = jnp.asarray(np.random.RandomState(16).randn(6, 16).astype(np.float32))
        pts = jnp.asarray(np.random.RandomState(17).randn(6, 3).astype(np.float32))
        kw = dict(time_step=jnp.asarray(0.5), frame_id=jnp.asarray(3))
        v = m.init(jax.random.PRNGKey(16), hidden, pts, **kw)
        flow, moved = m.apply(v, hidden, pts, **kw)
        assert flow.shape == (6, 3) and moved.shape == (6, 3)
        assert np.isfinite(np.asarray(moved)).all()

    def test_dct_zero_init(self):
        m = FlowHead(width=16, flow_model="dct", num_basis=4, n_frames=8)
        hidden = jnp.ones((6, 16))
        pts = jnp.ones((6, 3))
        kw = dict(time_step=jnp.asarray(0.2), frame_id=jnp.asarray(1))
        v = m.init(jax.random.PRNGKey(17), hidden, pts, **kw)
        flow, moved = m.apply(v, hidden, pts, **kw)
        np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(moved), np.asarray(pts))

    def test_dct_basis_formula(self):
        b = init_dct_basis(3, 10)
        assert b.shape == (10, 3)
        expect = np.sqrt(2 / 10) * np.cos(np.pi / 20 * (2 * 4 + 1) * 2)
        np.testing.assert_allclose(b[4, 1], expect, rtol=1e-6)


class TestSplatFields:
    def _small_cfg(self, **kw):
        return dict(
            encoder_type="VarTriPlaneEncoder",
            encoder_args={"noise_res": 4},
            deform_w=16, deform_d=2, deform_skips=(1,),
            rgb_w=16, rgb_d=2, rgb_skips=(1,),
            scale_w=8, scale_d=2, scale_skips=(1,),
            opacity_w=8, opacity_d=2, opacity_skips=(1,),
            rotation_w=8, rotation_d=2, rotation_skips=(20,),
            flow_w=16, flow_d=2, flow_skips=(1,),
            **kw)

    def test_static_forward(self):
        m = SplatFields(n_frames=0, **self._small_cfg())
        xyz = jnp.asarray(np.random.RandomState(20).uniform(-1, 1, (11, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(20), xyz)
        out = m.apply(v, xyz)
        assert out["scales"].shape == (11, 3)
        assert out["opacity"].shape == (11, 1)
        assert out["rotations"].shape == (11, 4)
        assert out["rgb"].shape == (11, 3)
        assert out["flow"] is None
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["rotations"]), axis=-1), 1.0,
            atol=1e-5)
        op = np.asarray(out["opacity"])
        assert (op >= 0).all() and (op <= 1).all()

    def test_dynamic_forward_with_flow(self):
        m = SplatFields(n_frames=8, flow_model="offset", composition_rank=4,
                        **self._small_cfg())
        xyz = jnp.asarray(np.random.RandomState(21).uniform(-1, 1, (7, 3)).astype(np.float32))
        t = jnp.full((7, 1), 0.5)
        v = m.init(jax.random.PRNGKey(21), xyz, t)
        out = m.apply(v, xyz, t)
        assert out["flow"].shape == (7, 3)
        assert out["means3D"].shape == (7, 3)
        out2 = m.apply(v, xyz, jnp.full((7, 1), 1.0))
        assert np.abs(np.asarray(out["means3D"]) - np.asarray(out2["means3D"])).max() > 0

    def test_deform_weight_zero(self):
        m = SplatFields(n_frames=0, deform_weight=0.0, **self._small_cfg())
        xyz = jnp.asarray(np.random.RandomState(22).uniform(-1, 1, (5, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(22), xyz)
        out = m.apply(v, xyz)
        np.testing.assert_allclose(np.asarray(out["means3D"]),
                                   np.asarray(xyz), atol=1e-7)

    def test_pure_mlp_ablation(self):
        m = SplatFields(n_frames=0, encoder_type="none",
                        **{k: v for k, v in self._small_cfg().items()
                           if k not in ("encoder_type", "encoder_args")})
        xyz = jnp.ones((3, 3))
        v = m.init(jax.random.PRNGKey(23), xyz)
        out = m.apply(v, xyz)
        assert out["rgb"].shape == (3, 3)

    def test_view_dep_rgb(self):
        m = SplatFields(n_frames=0, use_view_dep_rgb=True, **self._small_cfg())
        xyz = jnp.ones((4, 3))
        v = m.init(jax.random.PRNGKey(24), xyz)
        out = m.apply(v, xyz)
        assert "rgb" not in out and out["rgb_feat"].shape == (4, 16)
        dirs = jnp.asarray(np.random.RandomState(25).randn(4, 3).astype(np.float32))
        rgb = m.apply(v, out["rgb_feat"], dirs, method=SplatFields.rgb_from_viewdir)
        assert rgb.shape == (4, 3)
        assert (np.asarray(rgb) >= 0).all()

    def test_fused_heads_match_sequential(self):
        """fuse_heads=True (batched einsum per level) must be numerically
        identical to the sequential GeneralMLP path in every fusable
        config — and silently fall back for active ResField ranks."""
        cases = [
            dict(n_frames=0),
            dict(n_frames=0, geo_model_disable_pts=True),
            dict(n_frames=0, use_view_dep_rgb=True),
            dict(n_frames=0, deform_weight=0.0),
            dict(n_frames=6, flow_model="offset", composition_rank=0),
            dict(n_frames=6, flow_model="se3", composition_rank=4),  # fallback
        ]
        for i, extra in enumerate(cases):
            m1 = SplatFields(fuse_heads=True, **self._small_cfg(), **extra)
            m0 = SplatFields(fuse_heads=False, **self._small_cfg(), **extra)
            rng = np.random.RandomState(40 + i)
            xyz = jnp.asarray(rng.uniform(-1, 1, (9, 3)).astype(np.float32))
            t = jnp.full((9, 1), 0.4) if extra.get("n_frames") else None
            v = m0.init(jax.random.PRNGKey(40 + i), xyz, t)
            o0 = m0.apply(v, xyz, t)
            o1 = m1.apply(v, xyz, t)
            for k in o0:
                if o0[k] is None:
                    assert o1[k] is None, k
                    continue
                np.testing.assert_allclose(
                    np.asarray(o0[k]), np.asarray(o1[k]), atol=1e-6,
                    err_msg=f"case {extra} key {k}")

    def test_precomputed_planes_match(self):
        m = SplatFields(n_frames=0, **self._small_cfg())
        xyz = jnp.asarray(np.random.RandomState(26).uniform(-1, 1, (6, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(26), xyz)
        planes = m.apply(v, method=SplatFields.generate_planes)
        out1 = m.apply(v, xyz)
        out2 = m.apply(v, xyz, planes=planes)
        np.testing.assert_allclose(np.asarray(out1["rgb"]),
                                   np.asarray(out2["rgb"]), atol=1e-6)


class TestAuxGenerators:
    def test_tensorial1d(self):
        from splatfields_tpu.models.decoder import Tensorial1D
        m = Tensorial1D(noise_res=4)
        v = m.init(jax.random.PRNGKey(30))
        y = m.apply(v)
        assert y.shape == (1, 64, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_tensorial3d(self):
        from splatfields_tpu.models.decoder import Tensorial3D
        m = Tensorial3D(noise_res=2)
        v = m.init(jax.random.PRNGKey(31))
        y = m.apply(v)
        assert y.shape == (1, 16, 16, 16, 16)

    def test_var_grid_encoder(self):
        from splatfields_tpu.models.encoders import VarGridEncoder
        m = VarGridEncoder(noise_res=2)
        pts = jnp.asarray(np.random.RandomState(32).uniform(-1, 1, (6, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(32), pts)
        y = m.apply(v, pts)
        assert y.shape == (6, 16)

    def test_vae_decoder_alias(self):
        from splatfields_tpu.models.decoder import VAEDecoder
        m = VAEDecoder(block_out_channels=(32, 32))
        z = jnp.ones((1, 6, 6, 8))
        v = m.init(jax.random.PRNGKey(33), z)
        y = m.apply(v, z)
        assert y.shape == (1, 12, 12, 16)


class TestEncoderTypesViaDeformModel:
    """Every registered encoder_type constructs and runs through the
    DeformModel wrapper (the CLI path)."""

    def _run(self, enc_type, enc_args=None, n_frames=0):
        from splatfields_tpu import config as cfg_lib
        from splatfields_tpu.models.deform_model import DeformModel
        hidden = cfg_lib.HiddenConfig(
            encoder_type=enc_type, composition_rank=0, n_frames=n_frames,
            encoder_args=enc_args or {})
        deform = DeformModel(hidden, radius=1.0)
        xyz = jnp.asarray(np.random.RandomState(40).uniform(
            -1, 1, (7, 3)).astype(np.float32))
        t = (jnp.full((7, 1), 0.5) if n_frames > 0 else None)
        if t is not None:
            out = deform.net.apply(deform.variables, xyz, t)
        else:
            out = deform.net.apply(deform.variables, xyz)
        assert out["scales"].shape == (7, 3)
        assert np.isfinite(np.asarray(out["means3D"])).all()

    def test_triplane(self):
        self._run("TriPlaneEncoder", {"resolution": 16, "channels": 4})

    def test_grid(self):
        self._run("GridEncoder", {"resolution": 8, "channels": 4})

    def test_hexplane_dynamic(self):
        self._run("HexPlaneEncoder", {"resolution": 16, "channels": 4},
                  n_frames=4)

    def test_ngp(self):
        self._run("NGPMLP", {"n_levels": 4, "log2_hashmap_size": 10})

    def test_varhex_dynamic(self):
        self._run("VarHexPlaneEncoder", {"noise_res": 4}, n_frames=4)
