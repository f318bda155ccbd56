"""Training metrics logging (the reference's TensorBoard role, SURVEY 5.5).

JSONL scalar stream + optional TensorBoard when the package exists. One
line per logged step: {"step": N, "tag": value, ...} — cheap to parse,
no dependency.

Beyond scalars (parity with reference ``train.py:401-440``):
- ``images``: render/gt/mask/depth panels saved as PNGs under
  ``<model_path>/panels/iter_<step>/`` (the reference's
  ``tb_writer.add_images`` role, but file-based so it works without
  TensorBoard) and mirrored to TB when available.
- ``histogram``: bin counts + edges as a JSONL record (the reference's
  ``scene/opacity_histogram``) and TB ``add_histogram``.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


class MetricsWriter:
    def __init__(self, model_path: str | None):
        self._file = None
        self._tb = None
        if model_path:
            os.makedirs(model_path, exist_ok=True)
            self._file = open(os.path.join(model_path, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(model_path)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: dict[str, Any]):
        if self._file is None:
            return
        rec = {"step": int(step)}
        for k, v in values.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._file.write(json.dumps(rec) + "\n")
        if step % 100 == 0:
            self._file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def images(self, step: int, name: str, panels: dict[str, Any]):
        """Save [3, H, W] float [0,1] panels as PNGs (+ TB images)."""
        if self._file is None:
            return
        base = os.path.dirname(self._file.name)
        out_dir = os.path.join(base, "panels", f"iter_{int(step)}")
        os.makedirs(out_dir, exist_ok=True)
        import cv2

        for tag, img in panels.items():
            arr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
            if arr.ndim == 3 and arr.shape[0] in (1, 3):
                arr = arr.transpose(1, 2, 0)
            if arr.ndim == 2:
                arr = arr[..., None]
            if arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, axis=-1)
            png = (arr * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, f"{name}_{tag}.png"),
                        png[..., ::-1])
            if self._tb is not None:
                self._tb.add_images(f"{name}/{tag}",
                                    arr.transpose(2, 0, 1)[None], step)

    def histogram(self, step: int, name: str, values: Any, bins: int = 64):
        if self._file is None:
            return
        vals = np.asarray(values, np.float32).reshape(-1)
        counts, edges = np.histogram(vals, bins=bins)
        rec = {"step": int(step), "histogram": name,
               "counts": counts.tolist(),
               "edges": np.round(edges, 6).tolist()}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            try:
                import torch
                self._tb.add_histogram(name, torch.from_numpy(vals), step)
            except Exception:
                pass

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
