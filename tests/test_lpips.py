"""LPIPS (ops/lpips.py) vs an independent torch oracle.

torchvision / the lpips package are not installed, so the oracle below
re-implements the published LPIPS-VGG formula (lpips/lpips.py: ScalingLayer
-> vgg16 taps -> unit-normalize -> 1x1 lin -> spatial average -> sum)
directly in torch with SYNTHETIC weights in the documented npz layout.
Agreement here validates the JAX port's conv padding, pooling, tap
placement, normalization and reduction — the real pretrained file then
only supplies numbers.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from splatfields_tpu.ops import lpips as jl

CONV_IDX = [i for blk in jl._BLOCKS for i in blk]
CHANNELS = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
            10: (128, 256), 12: (256, 256), 14: (256, 256),
            17: (256, 512), 19: (512, 512), 21: (512, 512),
            24: (512, 512), 26: (512, 512), 28: (512, 512)}
TAP_C = [64, 128, 256, 512, 512]


def synth_weights(seed=0, scale=0.05):
    rng = np.random.RandomState(seed)
    d = {}
    for i in CONV_IDX:
        cin, cout = CHANNELS[i]
        d[f"features.{i}.weight"] = (
            rng.randn(cout, cin, 3, 3).astype(np.float32) * scale)
        d[f"features.{i}.bias"] = (
            rng.randn(cout).astype(np.float32) * scale)
    for k, c in enumerate(TAP_C):
        d[f"lins.{k}.weight"] = np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32))
    return d


def torch_lpips_oracle(raw, a_hwc, b_hwc):
    """a,b [H,W,3] in [0,1] -> LPIPS scalar (independent reimpl)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x_hwc):
        x = torch.from_numpy(x_hwc).float().permute(2, 0, 1)[None] * 2 - 1
        h = (x - shift) / scale
        outs = []
        for bi, blk in enumerate(jl._BLOCKS):
            if bi > 0:
                h = F.max_pool2d(h, 2, 2)
            for i in blk:
                w = torch.from_numpy(raw[f"features.{i}.weight"])
                b = torch.from_numpy(raw[f"features.{i}.bias"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
            outs.append(h)
        return outs

    total = 0.0
    with torch.no_grad():
        for k, (fa, fb) in enumerate(zip(feats(a_hwc), feats(b_hwc))):
            na = fa / (fa.norm(dim=1, keepdim=True) + 1e-10)
            nb = fb / (fb.norm(dim=1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(raw[f"lins.{k}.weight"])
            d = F.conv2d((na - nb) ** 2, lin)
            total = total + d.mean(dim=(2, 3)).sum()
    return float(total)


class TestLPIPS:
    def test_matches_torch_oracle(self):
        raw = synth_weights()
        fn = jl.JaxLPIPS(jl._to_jax_weights(raw))
        rng = np.random.RandomState(3)
        a = rng.rand(64, 96, 3).astype(np.float32)
        b = np.clip(a + rng.randn(64, 96, 3).astype(np.float32) * 0.1, 0, 1)
        got = fn(a, b)
        want = torch_lpips_oracle(raw, a, b)
        assert got == pytest.approx(want, rel=2e-3), (got, want)

    def test_identical_images_zero(self):
        raw = synth_weights(seed=1)
        fn = jl.JaxLPIPS(jl._to_jax_weights(raw))
        a = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
        assert fn(a, a.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_load_lpips_roundtrip(self, tmp_path):
        raw = synth_weights(seed=2)
        p = str(tmp_path / "w.npz")
        np.savez(p, **raw)
        fn = jl.load_lpips(p)
        assert fn is not None
        a = np.random.RandomState(1).rand(32, 48, 3).astype(np.float32)
        b = np.random.RandomState(2).rand(32, 48, 3).astype(np.float32)
        assert fn(a, b) == pytest.approx(
            torch_lpips_oracle(raw, a, b), rel=2e-3)

    def test_missing_weights_none(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SPLATFIELDS_LPIPS", raising=False)
        assert jl.load_lpips(str(tmp_path / "absent.npz")) is None

    def test_malformed_weights_none(self, tmp_path):
        p = str(tmp_path / "bad.npz")
        np.savez(p, junk=np.zeros(3))
        assert jl.load_lpips(p) is None

    def test_try_lpips_env_discovery(self, tmp_path, monkeypatch):
        from splatfields_tpu import metrics
        raw = synth_weights(seed=4)
        p = str(tmp_path / "w.npz")
        np.savez(p, **raw)
        monkeypatch.setenv("SPLATFIELDS_LPIPS", p)
        fn = metrics.try_lpips()
        assert fn is not None
        a = np.random.RandomState(5).rand(16, 16, 3).astype(np.float32)
        b = np.random.RandomState(6).rand(16, 16, 3).astype(np.float32)
        assert fn(a, b) > 0.0
