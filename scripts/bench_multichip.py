"""Multi-chip scaling harness: sharded FULL train step over a device mesh.

On real multi-chip hardware this measures rays/s at 1 chip vs N chips
(the BASELINE.json scaling axis). On a single-chip/CPU host it still runs —
over the virtual device mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count) — validating the SPMD program and
reporting (non-indicative for absolute speed, but meaningful for
collective/overhead scaling) wall times.

Usage:
    python scripts/bench_multichip.py [n_devices] [data_axis]
    python scripts/bench_multichip.py sweep      # 1,2,4,8-device table

Committed sweep output (8 virtual CPU devices, 64x64, 1024 splats,
full field train step, cache-defeating 10-iter mean) lands in
MULTICHIP_SCALING.md.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon sitecustomize force-sets jax_platforms="axon,cpu"
    # programmatically; the env var alone is not enough (CLAUDE.md)
    import jax
    jax.config.update("jax_platforms", "cpu")


def run(n_devices, data_axis, ring=False):
    import math

    import jax
    import jax.numpy as jnp

    from splatfields_tpu import config as cfg_lib
    from splatfields_tpu.models import splats as splats_lib
    from splatfields_tpu.models.deform_model import DeformModel
    from splatfields_tpu.parallel.mesh import make_mesh
    from splatfields_tpu.parallel.step import (
        make_sharded_train_step, replicate, shard_train_state)
    from splatfields_tpu.utils import camera_math as cm

    devs = jax.devices()
    on_cpu = devs[0].platform == "cpu"
    width = height = 64 if on_cpu else 800
    n = 1024 if on_cpu else 100_000
    n = -(-n // n_devices) * n_devices

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

    hidden = cfg_lib.HiddenConfig(encoder_type="VarTriPlaneEncoder",
                                  composition_rank=0, n_frames=0)
    if on_cpu:
        hidden.encoder_args = {"noise_res": 4}
    deform = DeformModel(hidden, radius=1.0)
    opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_norm=0.01)
    pipe_cfg = cfg_lib.PipelineConfig(
        tile_cap=1024 if not on_cpu else 128,
        k_chunk=128 if not on_cpu else 32)

    views = data_axis
    batch = {
        "viewmatrix": jnp.asarray(np.stack([w2v] * views)),
        "projmatrix": jnp.asarray(np.stack([full] * views)),
        "campos": jnp.asarray(np.stack([campos] * views)),
        "tanfovx": jnp.full((views,), tanfov, jnp.float32),
        "tanfovy": jnp.full((views,), tanfov, jnp.float32),
        "fid": jnp.zeros((), jnp.float32),
        "image": jnp.asarray(
            rng.rand(views, 3, height, width).astype(np.float32)),
        "mask": jnp.zeros((views, 1, 1, 1), jnp.float32),
        "depth": jnp.zeros((views, 1, 1), jnp.float32),
        "bg": jnp.ones(3, jnp.float32),
    }
    lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)

    mesh = make_mesh(n_devices, data=data_axis)
    step = make_sharded_train_step(
        deform.net, opt_cfg, pipe_cfg, width, height,
        views_per_shard=views // data_axis, field_mode=True, n_frames=0,
        mesh=mesh, ring=ring)
    sp, st, so = shard_train_state(params, stats, splat_opt, mesh)
    fv = replicate(deform.variables, mesh)
    fo = replicate(deform.opt_state, mesh)
    flr = jnp.asarray(1e-3, jnp.float32)

    sp, st, so, fp, fo, out = step(sp, st, so, fv, fo, batch, lrs, flr)
    _ = float(out.loss)  # materialize (block_until_ready is unreliable
    #                      on the axon TPU backend — CLAUDE.md pitfall 2)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        # vary the batch so no relay/execution cache can short-circuit:
        # multiplicative and well above float32 ulp so the bits change
        # (an additive 1e-12 was a no-op — advisor r2 finding 4)
        batch["image"] = batch["image"] * np.float32(1.0 + (i + 1) * 1e-4)
        fv = dict(fv, params=fp)
        sp, st, so, fp, fo, out = step(sp, st, so, fv, fo, batch, lrs, flr)
    _ = float(out.loss)
    dt = (time.perf_counter() - t0) / iters
    rays = width * height * views / dt
    tag = " ring" if ring else ""
    line = (f"mesh data={data_axis} x model={n_devices // data_axis}{tag}: "
            f"{dt * 1000:.2f} ms/step, {rays:.0f} rays/s, "
            f"loss={float(out.loss):.4f}")
    print(line, flush=True)
    return line


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        lines = [run(1, 1), run(2, 1), run(4, 1), run(8, 1), run(8, 2),
                 run(8, 1, ring=True)]
        print("\n".join(lines))
        return
    args = [int(a) for a in sys.argv[1:]]
    n_devices = args[0] if args else None
    data_axis = args[1] if len(args) > 1 else 1
    if n_devices is None:
        import jax
        n_devices = len(jax.devices())
    run(n_devices, data_axis)


if __name__ == "__main__":
    main()
