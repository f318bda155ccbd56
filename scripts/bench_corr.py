"""Measure the Moran/KNN regularizer's step cost and the --corr_interval
mitigation on the real chip (VERDICT r2 item 4's committed row).

Times the bench train step with lambda_corr=0.01 at 50k and 100k splats:
every step (reference schedule), gated OFF, and the amortized cost at
--corr_interval 4. Sound harness per CLAUDE.md (state evolves per step;
final scalar materialized).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time

import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

from splatfields_tpu import config as cfg_lib
from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.utils import camera_math as cm


def run(n, corr_interval, gate_pattern, iters=12):
    width = height = 800
    rng = np.random.RandomState(0)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 4.0], np.float32)
    w2v = cm.get_world2view(R, t).T
    fov = 0.8
    proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
    full = (w2v @ proj).astype(np.float32)
    campos = np.linalg.inv(w2v.T)[:3, 3].astype(np.float32)
    tanfov = math.tan(fov / 2)
    pts = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    params, stats = splats_lib.create_from_pcd(
        pts, np.abs(pts), 0, capacity=n)
    splat_opt = splats_lib.adam_init(params)
    hidden = cfg_lib.HiddenConfig(
        encoder_type="VarTriPlaneEncoder", composition_rank=0, n_frames=0)
    deform = DeformModel(hidden, radius=1.0)
    opt_cfg = cfg_lib.OptimizationConfig(
        lambda_mask=0.0, lambda_norm=0.01, lambda_corr=0.01,
        corr_interval=corr_interval)
    pipe_cfg = cfg_lib.PipelineConfig(tile_size=16, tile_cap=1024,
                                      k_chunk=128)
    step = train_lib.make_train_step(
        deform.net, opt_cfg, pipe_cfg, width, height, num_views=1,
        field_mode=True, n_frames=0, sh_degree=0)
    batch = {
        "viewmatrix": jnp.asarray(w2v)[None],
        "projmatrix": jnp.asarray(full)[None],
        "campos": jnp.asarray(campos)[None],
        "tanfovx": jnp.full((1,), tanfov, jnp.float32),
        "tanfovy": jnp.full((1,), tanfov, jnp.float32),
        "fid": jnp.zeros((), jnp.float32),
        "image": jnp.asarray(
            rng.rand(1, 3, height, width).astype(np.float32)),
        "mask": jnp.zeros((1, 1, 1, 1), jnp.float32),
        "depth": jnp.zeros((1, 1, 1), jnp.float32),
        "bg": jnp.ones(3, jnp.float32),
    }
    lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
    key = jax.random.PRNGKey(0)
    fv, fo = deform.variables, deform.opt_state

    def one(i):
        b = dict(batch)
        if corr_interval > 1:
            b["corr_gate"] = jnp.asarray(
                np.float32(gate_pattern(i)))
        return b

    out = step(params, stats, splat_opt, fv, fo, one(0), lrs,
               jnp.asarray(1e-3, jnp.float32), key)
    p, s, so, fp, fo_, res, key = out
    fvv = dict(fv, params=fp)
    _ = float(res.loss)
    # compile the other cond branch too
    if corr_interval > 1:
        out = step(p, s, so, fvv, fo_, one(1), lrs,
                   jnp.asarray(1e-3, jnp.float32), key)
        p, s, so, fp, fo_, res, key = out
        fvv = dict(fvv, params=fp)
        _ = float(res.loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, s, so, fp, fo_, res, key = step(
            p, s, so, fvv, fo_, one(i), lrs,
            jnp.asarray(1e-3, jnp.float32), key)
        fvv = dict(fvv, params=fp)
    _ = float(res.loss)
    return (time.perf_counter() - t0) / iters * 1000


for n in (50_000, 100_000):
    every = run(n, 1, lambda i: 1.0)
    off = run(n, 4, lambda i: 0.0)
    amort = run(n, 4, lambda i: 1.0 if i % 4 == 0 else 0.0)
    print(f"n={n}: corr every step {every:.1f} ms | gated off {off:.1f} ms "
          f"| interval=4 amortized {amort:.1f} ms", flush=True)
