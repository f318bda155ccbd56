"""Evaluation metrics (host NumPy) matching the reference pipeline.

Parity target: reference ``render.py:28-208``:
- ``compute_psnr`` (:33-43),
- ``compute_ssim`` (:45-160): the multinerf partial-convolution SSIM with
  VALID-mode separable Gaussian filtering and box-count renormalization —
  reproduced exactly (including the quirk that the mask renormalization
  uses a box filter while the image uses the Gaussian),
- LPIPS-VGG (:174-180): requires the ``lpips`` package + pretrained VGG
  weights; unavailable in this zero-egress environment, so ``eval_all``
  records ``lpips: null`` with a note instead (the reference would crash).
- ``eval_all`` (:182-208): PSNR / SSIM*100 / LPIPS*100 aggregated over a
  render dir into ``results.yaml``.
"""
from __future__ import annotations

import collections
import glob
import math
import os

import numpy as np
from scipy import signal


def compute_psnr(img0: np.ndarray, img1: np.ndarray) -> float:
    mse = np.mean((img0 - img1) ** 2)
    return float(-10.0 / math.log(10) * math.log(mse + 1e-20))


def compute_ssim(img0: np.ndarray, img1: np.ndarray,
                 mask: np.ndarray | None = None, max_val: float = 1.0,
                 filter_size: int = 11, filter_sigma: float = 1.5,
                 k1: float = 0.01, k2: float = 0.03) -> float:
    """Multinerf masked SSIM, valid-mode convolution (reference :45-160)."""
    if mask is None:
        mask = np.ones_like(img0[..., :1])
    mask = mask[..., 0]

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, m, f):
        chans = []
        for i in range(z.shape[-1]):
            chans.append(signal.convolve2d(z[..., i] * m, f, mode="valid"))
        z_ = np.stack(chans, axis=-1)
        m_ = signal.convolve2d(m, np.ones_like(f), mode="valid")
        out = np.where(m_[..., None] != 0,
                       z_ * np.sum(np.ones_like(f)) / m_[..., None], 0.0)
        return out, (m_ != 0).astype(z.dtype)

    def filt_fn(z, m):
        z1, m1 = convolve2d(z, m, filt[None, :])
        return convolve2d(z1, m1, filt[:, None])

    mu0 = filt_fn(img0, mask)[0]
    mu1 = filt_fn(img1, mask)[0]
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = filt_fn(img0**2, mask)[0] - mu00
    sigma11 = filt_fn(img1**2, mask)[0] - mu11
    sigma01 = filt_fn(img0 * img1, mask)[0] - mu01
    sigma00 = np.maximum(0.0, sigma00)
    sigma11 = np.maximum(0.0, sigma11)
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    return float(np.mean(numer / denom))


_LPIPS_NOTE = ("lpips unavailable: no local VGG-LPIPS weight file found "
               "(set $SPLATFIELDS_LPIPS or place weights/lpips_vgg.npz — "
               "see ops/lpips.py for the format) and the lpips package "
               "is not installed (no network egress in this environment)")


def try_lpips(weights_path: str | None = None):
    """Return an LPIPS callable or None (gated dependency).

    Preferred path: the pure-JAX VGG16 LPIPS (``ops/lpips.py``) fed from a
    local weight file. Falls back to the torch ``lpips`` package if that is
    importable (it is not in this image), else None -> ``lpips: null``.
    """
    try:
        from splatfields_tpu.ops.lpips import load_lpips
        fn = load_lpips(weights_path)
        if fn is not None:
            return fn
    except Exception:
        pass
    try:
        import lpips as lpips_pkg
        import torch
        net = lpips_pkg.LPIPS(net="vgg").eval()

        def fn(a, b):
            with torch.no_grad():
                ta = torch.from_numpy(a * 2 - 1).float().permute(2, 0, 1)[None]
                tb = torch.from_numpy(b * 2 - 1).float().permute(2, 0, 1)[None]
                return float(net(ta, tb))
        return fn
    except Exception:
        return None


def eval_imgs(pred: np.ndarray, gt: np.ndarray, lpips_fn=None,
              scale_ssim: float = 100.0, scale_lpips: float = 100.0) -> dict:
    """pred/gt uint8 [H,W,3] (BGR like cv2.imread in the reference —
    channel order does not change any of these metrics)."""
    p = pred.astype(np.float32) / 255.0
    g = gt.astype(np.float32) / 255.0
    out = {
        "psnr": compute_psnr(p, g),
        "ssim": compute_ssim(p, g) * scale_ssim,
    }
    if lpips_fn is not None:
        out["lpips"] = lpips_fn(p, g) * scale_lpips
    return out


def eval_all(src_dir: str, scale_ssim: float = 100.0,
             scale_lpips: float = 100.0,
             lpips_weights_path: str | None = None) -> dict:
    """Aggregate metrics over gt/ vs renders/ into results.yaml."""
    import cv2

    gt_dir = os.path.join(src_dir, "gt")
    pred_dir = os.path.join(src_dir, "renders")
    gt_paths = sorted(glob.glob(os.path.join(gt_dir, "*.png"))
                      + glob.glob(os.path.join(gt_dir, "*.jpg")))
    pred_paths = sorted(glob.glob(os.path.join(pred_dir, "*.png"))
                        + glob.glob(os.path.join(pred_dir, "*.jpg")))
    assert len(gt_paths) == len(pred_paths), (
        f"gt/pred count mismatch: {len(gt_paths)} vs {len(pred_paths)}")

    lpips_fn = try_lpips(lpips_weights_path)
    results = collections.defaultdict(list)
    for gp, pp in zip(gt_paths, pred_paths):
        assert os.path.basename(gp) == os.path.basename(pp)
        ev = eval_imgs(cv2.imread(pp), cv2.imread(gp), lpips_fn,
                       scale_ssim, scale_lpips)
        for k, v in ev.items():
            results[k].append(v)

    summary = {k: float(np.mean(v)) for k, v in results.items()}
    dst = os.path.join(src_dir, "results.yaml")
    with open(dst, "w") as f:
        f.write(f"ssim: {summary.get('ssim')}\n")
        f.write(f"psnr: {summary.get('psnr')}\n")
        if "lpips" in summary:
            f.write(f"lpips: {summary['lpips']}\n")
        else:
            f.write(f"lpips: null  # {_LPIPS_NOTE}\n")
    print("Saved results to", dst)
    for k, v in summary.items():
        print(k, "=", v)
    return summary
