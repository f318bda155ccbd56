"""Full training-state checkpointing (mid-training resume).

The reference has NO trainer resume — only the per-iteration PLY + field
weights used by render.py (SURVEY 5.4). This module adds the missing
capability: splat params + stats + both Adam states + field variables +
RNG in one msgpack blob under ``model_path/train_state/iteration_N/``, so
``--resume`` continues training bit-exactly where it stopped.
"""
from __future__ import annotations

import json
import os
import flax.serialization
import jax
import numpy as np

from splatfields_tpu.utils.system import search_for_max_iteration


def save_train_state(model_path: str, iteration: int, splat_params,
                     splat_stats, splat_opt, field_vars, field_opt,
                     rng, extra: dict | None = None):
    out = os.path.join(model_path, "train_state", f"iteration_{iteration}")
    os.makedirs(out, exist_ok=True)
    state = {
        "splat_params": splat_params,
        "splat_stats": splat_stats,
        "splat_opt": splat_opt,
        "field_vars": field_vars,
        "field_opt": field_opt,
        "rng": rng,
    }
    # flatten to a plain leaf list (msgpack can't serialize the custom
    # pytree dataclasses); the loader re-threads structure from a template
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]
    with open(os.path.join(out, "state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(leaves))
    meta = {"iteration": iteration,
            "capacity": int(np.asarray(splat_params.xyz).shape[0])}
    meta.update(extra or {})
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_train_state(model_path: str, template: dict,
                     iteration: int = -1) -> tuple[dict, int] | None:
    """Restore into ``template`` (a dict with the same keys/structure as
    saved). Returns (state, iteration) or None if no checkpoint exists."""
    root = os.path.join(model_path, "train_state")
    if iteration == -1:
        iteration = search_for_max_iteration(root)
        if iteration is None:
            return None
    path = os.path.join(root, f"iteration_{iteration}", "state.msgpack")
    if not os.path.exists(path):
        return None
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    with open(path, "rb") as f:
        leaves = flax.serialization.from_bytes(
            [np.asarray(x) for x in t_leaves], f.read())
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, iteration
