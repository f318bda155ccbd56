"""Multi-chip scaling harness: sharded step throughput over a device mesh.

On real multi-chip hardware this measures rays/s at 1 chip vs N chips
(the BASELINE.json scaling axis). On a single-chip/CPU host it still runs —
over the virtual device mesh — validating the SPMD program and reporting
(non-indicative) wall times.

Usage: python scripts/bench_multichip.py [n_devices] [data_axis]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main(n_devices=None, data_axis=None):
    import jax
    import jax.numpy as jnp

    from splatfields_tpu import config as cfg_lib
    from splatfields_tpu.models import splats as splats_lib
    from splatfields_tpu.models.deform_model import DeformModel
    from splatfields_tpu.parallel.mesh import make_mesh
    from splatfields_tpu.parallel.step import (
        make_sharded_train_step, replicate, shard_splats)
    from splatfields_tpu.utils import camera_math as cm
    import math

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if data_axis is None:
        data_axis = 1
    width = height = 800 if devs[0].platform != "cpu" else 64
    n = 100_000 if devs[0].platform != "cpu" else 1024
    n = -(-n // n_devices) * n_devices  # divisible by model axis

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

    hidden = cfg_lib.HiddenConfig(encoder_type="VarTriPlaneEncoder",
                                  composition_rank=0, n_frames=0)
    deform = DeformModel(hidden, radius=1.0)
    opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0)
    pipe_cfg = cfg_lib.PipelineConfig(
        tile_cap=1024 if width == 800 else 128,
        k_chunk=128 if width == 800 else 32)

    views = data_axis
    batch = {
        "viewmatrix": jnp.asarray(np.stack([w2v] * views)),
        "projmatrix": jnp.asarray(np.stack([full] * views)),
        "campos": jnp.asarray(np.stack([campos] * views)),
        "tanfovx": jnp.full((views,), tanfov, jnp.float32),
        "tanfovy": jnp.full((views,), tanfov, jnp.float32),
        "fid": jnp.zeros((views,), jnp.float32),
        "image": jnp.asarray(rng.rand(views, 3, height, width).astype(np.float32)),
        "mask": jnp.zeros((views, 1, height, width), jnp.float32),
        "bg": jnp.ones(3, jnp.float32),
    }

    mesh = make_mesh(n_devices, data=data_axis)
    step = make_sharded_train_step(
        deform.net, opt_cfg, pipe_cfg, width, height,
        views_per_shard=views // data_axis, field_mode=True, n_frames=0,
        mesh=mesh)
    with mesh:
        sp, valid = shard_splats(params, stats, mesh)
        fv = replicate(deform.variables, mesh)
        fo = replicate(deform.opt_state, mesh)
        loss, fp, fo2 = step(sp, valid, fv, batch,
                             jnp.asarray(1e-3, jnp.float32), fo)
        jax.block_until_ready(loss)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, fp, fo2 = step(sp, valid, fv, batch,
                                 jnp.asarray(1e-3, jnp.float32), fo)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
    rays = width * height * views / dt
    print(f"mesh data={data_axis} x model={n_devices // data_axis}: "
          f"{dt * 1000:.2f} ms/step, {rays:.0f} rays/s, "
          f"loss={float(loss):.4f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
