"""Filesystem helpers (reference ``utils/system_utils.py``)."""
from __future__ import annotations

import os


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str):
    """Max iteration_N subdirectory (reference :28-30)."""
    if not os.path.isdir(folder):
        return None
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)
             if f.startswith("iteration_")]
    return max(saved) if saved else None
