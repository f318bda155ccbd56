"""Pure-JAX LPIPS (VGG16 backbone), loading weights from a local file.

Parity target: the ``lpips`` package as used by the reference
(``render.py:174-180`` — ``lpips.LPIPS(net='vgg')`` on images scaled to
[-1, 1]).  The environment has no network egress and no pretrained VGG
checkpoint, so this module computes the metric from a user-supplied local
``.npz`` weight file instead of downloading:

Weight file contract (torch tensor layouts, converted at load):

- ``features.{i}.weight`` [out, in, 3, 3] and ``features.{i}.bias`` [out]
  for i in {0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28} — the 13 conv
  layers of ``torchvision.models.vgg16().features`` (3x3, padding 1, with
  2x2 max-pools between blocks).
- ``lins.{k}.weight`` [1, C_k, 1, 1] for k in 0..4 — the LPIPS linear
  calibration heads over the five tap activations (relu1_2, relu2_2,
  relu3_3, relu4_3, relu5_3 -> C = 64, 128, 256, 512, 512).

A machine with torchvision + lpips installed can produce the file with::

    import numpy as np, torchvision, lpips
    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features
    net = lpips.LPIPS(net='vgg')
    d = {f'features.{i}.weight': p for i, p in ...}  # see tests for layout
    np.savez('lpips_vgg.npz', **d)

Formula (lpips.LPIPS.forward, normalize=False):

1. inputs in [-1, 1], standardized by the LPIPS ``ScalingLayer``:
   ``(x - shift) / scale`` with the hard-coded ImageNet-derived constants;
2. VGG16 forward, tapping the 5 post-ReLU activations above;
3. each tap channel-unit-normalized: ``x / (||x||_2(channel) + 1e-10)``;
4. squared difference, 1x1 conv with the ``lins.k`` weights (no bias),
   spatial mean, summed over the 5 taps.

Weight discovery order: explicit path argument, ``$SPLATFIELDS_LPIPS``
env var, ``<repo>/weights/lpips_vgg.npz``.  ``load_lpips`` returns None
when nothing is found so callers keep the documented ``lpips: null``
fallback.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer, RGB order).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features conv indices, grouped by block; a 2x2 max-pool
# sits between consecutive blocks. LPIPS taps the last ReLU of each block.
_BLOCKS = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def find_weights(path: str | None = None) -> str | None:
    if path and os.path.isfile(path):
        return path
    env = os.environ.get("SPLATFIELDS_LPIPS", "")
    if env and os.path.isfile(env):
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    default = os.path.join(repo, "weights", "lpips_vgg.npz")
    return default if os.path.isfile(default) else None


def _to_jax_weights(raw) -> dict:
    """torch [O,I,3,3] conv kernels -> NHWC/HWIO jnp arrays."""
    w = {}
    for blk in _BLOCKS:
        for i in blk:
            k = np.asarray(raw[f"features.{i}.weight"], np.float32)
            w[f"conv{i}_w"] = jnp.asarray(k.transpose(2, 3, 1, 0))  # HWIO
            w[f"conv{i}_b"] = jnp.asarray(
                np.asarray(raw[f"features.{i}.bias"], np.float32))
    for k in range(len(_BLOCKS)):
        lin = np.asarray(raw[f"lins.{k}.weight"], np.float32)  # [1,C,1,1]
        w[f"lin{k}"] = jnp.asarray(lin.reshape(-1))
    return w


@jax.jit
def _lpips_jax(weights: dict, a, b):
    """a, b: [N, H, W, 3] float32 in [-1, 1] (RGB). Returns [N]."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def taps(x):
        h = (x - shift) / scale
        outs = []
        for bi, blk in enumerate(_BLOCKS):
            if bi > 0:
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            for i in blk:
                h = lax.conv_general_dilated(
                    h, weights[f"conv{i}_w"], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jax.nn.relu(h + weights[f"conv{i}_b"])
            outs.append(h)
        return outs

    total = 0.0
    for k, (fa, fb) in enumerate(zip(taps(a), taps(b))):
        na = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        nb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        # lins.k is a 1x1 conv with no bias: a channel dot product
        total = total + jnp.mean(
            jnp.sum(d * weights[f"lin{k}"], axis=-1), axis=(1, 2))
    return total


class JaxLPIPS:
    """Callable matching ``metrics.try_lpips``'s contract:
    ``fn(a, b) -> float`` with a, b [H, W, 3] float32 in [0, 1]."""

    def __init__(self, weights: dict):
        self.weights = weights

    def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
        ta = jnp.asarray(a, jnp.float32)[None] * 2.0 - 1.0
        tb = jnp.asarray(b, jnp.float32)[None] * 2.0 - 1.0
        return float(_lpips_jax(self.weights, ta, tb)[0])


def load_lpips(path: str | None = None) -> JaxLPIPS | None:
    """Build the LPIPS callable from a local npz, or None if absent."""
    found = find_weights(path)
    if found is None:
        return None
    try:
        with np.load(found) as raw:
            weights = _to_jax_weights(raw)
    except Exception as e:  # malformed file -> same null fallback
        print(f"lpips weights at {found} unusable ({e}); reporting null")
        return None
    return JaxLPIPS(weights)
