"""Field-model wrapper: SplatFields net + its Adam + checkpoint IO.

Parity target: reference ``scene/deform_model.py`` (``SplatFieldsModel``):
one Adam(eps=1e-15) over all field params at ``position_lr_init * 5`` with
exponential decay to ``position_lr_final`` over ``deform_lr_max_steps``;
weights under ``model_path/deform/iteration_N/``.

Checkpoints use flax serialization (msgpack) — the TPU-native equivalent of
the reference's ``deform.pth`` state_dict file.
"""
from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.splatfields import SplatFields
from splatfields_tpu.utils.schedules import expon_lr_func
from splatfields_tpu.utils.system import search_for_max_iteration

SPATIAL_LR_SCALE = 5.0


def build_splatfields(hidden_cfg, radius: float | None = None) -> SplatFields:
    """Instantiate the net from a HiddenConfig (flag surface -> module
    fields, reference ``SplatFields(**hyper_args.__dict__)``)."""
    h = hidden_cfg
    # frozen tuple-of-pairs so the module stays hashable (jit-static)
    enc_args = tuple(sorted(dict(getattr(h, "encoder_args", {}) or {}).items()))
    return SplatFields(
        n_frames=h.n_frames,
        radius=radius,
        encoder_type=h.encoder_type,
        encoder_args=enc_args,
        layer_strategy=h.layer_strategy,
        composition_rank=h.composition_rank,
        deform_weight=h.deform_weight,
        use_view_dep_rgb=h.use_view_dep_rgb,
        geo_model_disable_pts=h.geo_model_disable_pts,
        rgb_w=h.rgb_w,
        flow_model=h.flow_model,
        dct_basis=h.dct_basis,
        contract_ngp=h.contract_ngp,
        log2_hashmap_size=h.log2_hashmap_size,
        n_levels=h.n_levels,
    )


class DeformModel:
    """Host-side holder for net variables + optimizer state."""

    def __init__(self, hidden_cfg, radius=None, seed: int = 0):
        self.net = build_splatfields(hidden_cfg, radius)
        self.n_frames = hidden_cfg.n_frames
        key = jax.random.PRNGKey(seed)
        dummy_xyz = jnp.zeros((8, 3), jnp.float32)
        dummy_t = (jnp.zeros((8, 1), jnp.float32)
                   if self.n_frames > 0 else None)
        if dummy_t is not None:
            self.variables = self.net.init(key, dummy_xyz, dummy_t)
        else:
            self.variables = self.net.init(key, dummy_xyz)
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree.leaves(self.variables["params"]))
        print(f"DEFORM #params: {n_params / 1e6} M")
        self.opt_state = splats_lib.adam_init(self.variables["params"])
        self.scheduler = None

    def train_setting(self, opt_cfg):
        self.scheduler = expon_lr_func(
            lr_init=opt_cfg.position_lr_init * SPATIAL_LR_SCALE,
            lr_final=opt_cfg.position_lr_final,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.deform_lr_max_steps)

    def learning_rate(self, iteration: int) -> float:
        return float(self.scheduler(iteration))

    @property
    def params(self):
        return self.variables["params"]

    @params.setter
    def params(self, new_params):
        self.variables = dict(self.variables, params=new_params)

    @property
    def buffers(self) -> dict[str, Any]:
        return {k: v for k, v in self.variables.items() if k != "params"}

    def save_weights(self, model_path: str, iteration: int):
        out = os.path.join(model_path, f"deform/iteration_{iteration}")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "deform.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(self.variables))

    def load_weights(self, model_path: str, iteration: int = -1):
        if iteration == -1:
            iteration = search_for_max_iteration(
                os.path.join(model_path, "deform"))
        path = os.path.join(model_path, f"deform/iteration_{iteration}",
                            "deform.msgpack")
        with open(path, "rb") as f:
            self.variables = flax.serialization.from_bytes(
                self.variables, f.read())
        return iteration

    def log_variables(self):
        return {}
