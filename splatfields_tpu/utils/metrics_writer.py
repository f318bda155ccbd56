"""Training metrics logging (the reference's TensorBoard role, SURVEY 5.5).

JSONL scalar stream + optional TensorBoard when the package exists. One
line per logged step: {"step": N, "tag": value, ...} — cheap to parse,
no dependency.
"""
from __future__ import annotations

import json
import os
from typing import Any


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

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
