"""SSIM losses in JAX.

Two variants, both needed for parity:
- :func:`ssim`: the 11x11 Gaussian-window training SSIM (reference
  ``utils/loss_utils.py:33-76``), gradients flow for the D-SSIM loss term.
- :func:`masked_ssim`: the multinerf partial-convolution masked SSIM used
  for evaluation (reference ``render.py:45-160``).

Implementation notes (TPU): the separable 11x11 Gaussian filter is expressed
as two depthwise 1-D convolutions so XLA lowers it to cheap VPU sweeps; all
channels batched in one conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_same(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 'same' (zero-padded) Gaussian filter over [C, H, W].

    Shift-and-add instead of depthwise conv: 11 shifted scaled adds per
    axis are pure VPU work; TPU depthwise convolutions lower poorly.
    """
    ksize = k1d.shape[0]
    pad = ksize // 2
    c, h, w = img.shape

    def filt_axis(x, axis):
        size = x.shape[axis]
        padded = jnp.pad(
            x, [(0, 0) if a != axis else (pad, pad) for a in range(x.ndim)])
        out = jnp.zeros_like(x)
        for i in range(ksize):
            sl = jax.lax.slice_in_dim(padded, i, i + size, axis=axis)
            out = out + k1d[i] * sl
        return out

    return filt_axis(filt_axis(img, 1), 2)


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """Training SSIM over [C, H, W] images in [0,1].

    Matches reference ``utils/loss_utils.py:56-76``: 11x11 Gaussian window
    (sigma 1.5), zero padding, C1=0.01^2, C2=0.03^2, biased (uncorrected)
    variances.
    """
    if img1.ndim == 2:
        img1 = img1[None]
    if img2.ndim == 2:
        img2 = img2[None]
    k = jnp.asarray(_gaussian_kernel(window_size, 1.5))
    mu1 = _filter2d_same(img1, k)
    mu2 = _filter2d_same(img2, k)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_same(img1 * img1, k) - mu1_sq
    sigma2_sq = _filter2d_same(img2 * img2, k) - mu2_sq
    sigma12 = _filter2d_same(img1 * img2, k) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("filter_size",))
def masked_ssim(img0: jnp.ndarray, img1: jnp.ndarray, mask: jnp.ndarray,
                filter_size: int = 11) -> jnp.ndarray:
    """Masked SSIM via convolution-with-renormalization (multinerf style).

    Parity: reference ``render.py:45-160`` (``compute_ssim`` with mask): a
    Gaussian filter is applied only over valid pixels, weights renormalized
    by the filtered mask; SSIM map averaged over pixels where the filtered
    mask is (numerically) 1.

    Args:
        img0, img1: [H, W, C] images in [0,1].
        mask: [H, W, 1] binary validity.
    Returns:
        scalar mean masked SSIM.
    """
    sigma = filter_size / 6.0  # multinerf: filter_sigma tied to size? keep 1.5
    del sigma
    k = jnp.asarray(_gaussian_kernel(filter_size, 1.5))
    hw = filter_size // 2

    def convolve2d(z, m, f):
        # z: [H, W, C]; m: [H, W, 1]; f: [k] separable 1-D filter
        # filter z*m then renormalize by filtered m (partial convolution)
        def filt(x, axis):
            x = jnp.moveaxis(x, axis, -1)  # [..., H_axis]
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(hw, hw)])
            windows = jnp.stack(
                [x[..., i : i + z.shape[axis]] for i in range(filter_size)], 0
            )
            out = jnp.tensordot(f, windows, axes=[[0], [0]])
            return jnp.moveaxis(out, -1, axis)

        zm = filt(filt(z * m, 0), 1)
        mm = filt(filt(m.astype(z.dtype), 0), 1)
        out = zm / jnp.maximum(mm, 1e-10)
        valid = (mm > 1e-5).astype(z.dtype)
        return out * valid, valid

    mask = mask.astype(img0.dtype)
    mu0, v0 = convolve2d(img0, mask, k)
    mu1, _ = convolve2d(img1, mask, k)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00, _ = convolve2d(img0 * img0, mask, k)
    s11, _ = convolve2d(img1 * img1, mask, k)
    s01, _ = convolve2d(img0 * img1, mask, k)
    sigma00 = s00 - mu00
    sigma11 = s11 - mu11
    sigma01 = s01 - mu01
    sigma00 = jnp.maximum(0.0, sigma00)
    sigma11 = jnp.maximum(0.0, sigma11)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))
    c1, c2 = 0.01**2, 0.03**2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    w = v0 * mask
    return jnp.sum(ssim_map * w) / jnp.maximum(jnp.sum(w), 1e-10)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (reference
    ``utils/image_utils.py:15-21``)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))
