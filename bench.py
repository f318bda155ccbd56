"""Benchmark: SplatFields training-step throughput on one chip.

Default workload: the BASELINE.json headline config — SplatFields field
mode (VarTriPlaneEncoder CNN prior + 6 MLP heads) over 100k splats rendered
at Blender 800x800, full forward + backward + both Adam updates per step.

Metric: rays/s/chip (pixels rendered per second through fwd+bwd).

Prints ONE JSON line. ``vs_baseline`` is measured against the reference
CUDA pipeline's estimated step time for the same config (~80 ms/iter on the
reference's single-GPU setup -> 8.0e6 rays/s at 640k rays/view). The repo
publishes no numbers (BASELINE.md), so this denominator is an estimate
recorded here for consistency across rounds.

Variants (BASELINE.json configs 4/5; committed rows in BENCH_VARIANTS.md):

- ``--num_views V``: V distinct same-fid views per step, matching the
  reference's ``--all_training --num_views`` protocol
  (``/root/reference/train.py:157-163``; Owlii trains with 5). The field
  forward + CNN decode + Adam cost amortizes over V renders — in BOTH
  frameworks (the reference computes its gaussian_dict once per iteration
  too), so multi-view rays/s is protocol-realistic but its vs_baseline
  uses the same 1-view denominator and overstates the ratio.
- ``--variant owlii4d``: the Owlii 4D protocol model
  (``/root/reference/run_owlii.sh:7``): n_frames=100, ResField
  composition_rank=40 lookup on every MLP layer, offset FlowHead.
- ``--variant ngp``: the NGP backbone (``/root/reference/scene/
  ngpFields.py:15-84``): hash-grid encoder + heads, no CNN prior.

``--scan_k`` (default 4 — the train CLI's production default): K train
steps per device dispatch via ``lax.scan``; reported step_ms is dispatch
time / K. The scanned step is bit-parity-tested against the sequential
loop (tests/test_loss_paths.py::TestScannedStep, test_train_e2e.py::
TestScanK) — this is measured production training, not a bench trick; the
~1.6 ms/step it recovers is the axon relay's per-dispatch cost
(round-5 A/B, BENCH_VARIANTS.md: scan_k 0/4/8 = 47.42/45.82/45.64 ms).
``--scan_k 0`` reproduces the round-3/4 unscanned rows.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

BASELINE_RAYS_S = 8.0e6


def make_views(num_views, fov=0.8):
    """Distinct orbit cameras (one per view). Distinct matrices + GT keep
    XLA from CSE-ing identical per-view renders into one."""
    from splatfields_tpu.utils import camera_math as cm
    w2vs, fulls, camposs = [], [], []
    proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
    for v in range(num_views):
        th = 0.25 * v
        c, s = math.cos(th), math.sin(th)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.1 * v, 0, 4.0], np.float32)
        w2v = cm.get_world2view(R, t).T
        w2vs.append(w2v)
        fulls.append((w2v @ proj).astype(np.float32))
        camposs.append(np.linalg.inv(w2v.T)[:3, 3].astype(np.float32))
    return (np.stack(w2vs), np.stack(fulls), np.stack(camposs),
            math.tan(fov / 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=("field", "owlii4d", "ngp"),
                    default="field")
    ap.add_argument("--num_views", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_splats", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800,
                    help="render size (non-default values are smoke runs)")
    ap.add_argument("--scan_k", type=int, default=4,
                    help="K train steps per dispatch via lax.scan "
                         "(train_lib.make_scanned_train_step) — matches "
                         "the train CLI's production default. Reported "
                         "step_ms is per TRAIN STEP (dispatch time / K). "
                         "0 = unscanned (round-3/4 comparable rows)")
    ap.add_argument("--render_only", action="store_true",
                    help="serving benchmark: the production render path "
                         "(render_lib._render_jit) fwd-only, no losses/"
                         "grads/Adam; chained camera perturbation forces "
                         "sequential execution (CLAUDE.md pitfalls)")
    ap.add_argument("--render_batch", type=int, default=0,
                    help="with --render_only: render K frames per device "
                         "dispatch via lax.scan (the render CLI's "
                         "--render_batch offline path). 0 = per-frame "
                         "dispatch (serving latency, the default row)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from splatfields_tpu.utils.system import (
        enable_persistent_compile_cache, probe_backend)
    enable_persistent_compile_cache()

    # Bounded backend init: the axon relay outage of round 4 made
    # jax.devices() hang >25 min then die with a raw traceback — emit one
    # machine-readable JSON line instead so an environmental outage is
    # distinguishable from a repo regression (VERDICT.md round 4, item 1).
    devs, err = probe_backend(timeout_s=float(
        os.environ.get("SPLATFIELDS_BACKEND_TIMEOUT", "240")))
    if devs is None:
        print(json.dumps({
            "error": "tpu_backend_unavailable",
            "environmental": True,
            "detail": err,
            "metric": "rays_per_sec_fwd_bwd",
            "value": None,
        }))
        sys.stdout.flush()
        os._exit(1)  # a hung probe thread would block normal exit

    from splatfields_tpu import config as cfg_lib
    from splatfields_tpu import train_lib
    from splatfields_tpu.models import splats as splats_lib
    from splatfields_tpu.models.deform_model import DeformModel

    width = height = args.res
    n = args.n_splats
    v = args.num_views
    rng = np.random.RandomState(0)

    w2vs, fulls, camposs, tanfov = make_views(v)

    pts = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    params, stats = splats_lib.create_from_pcd(pts, cols, 0, capacity=n)
    splat_opt = splats_lib.adam_init(params)

    if args.variant == "owlii4d":
        # run_owlii.sh: VarTriPlane + rank-40 ResField lookup on every MLP
        # layer, 100 frames, offset flow (layer_strategy 'none' upstream
        # default, arguments/__init__.py:109)
        hidden = cfg_lib.HiddenConfig(
            encoder_type="VarTriPlaneEncoder", composition_rank=40,
            n_frames=100, flow_model="offset")
        n_frames = 100
    elif args.variant == "ngp":
        hidden = cfg_lib.HiddenConfig(
            encoder_type="NGPMLP", composition_rank=0, n_frames=0)
        n_frames = 0
    else:
        hidden = cfg_lib.HiddenConfig(
            encoder_type="VarTriPlaneEncoder", composition_rank=0, n_frames=0)
        n_frames = 0
    deform = DeformModel(hidden, radius=1.0)
    opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_norm=0.01)
    pipe_cfg = cfg_lib.PipelineConfig(tile_size=16, tile_cap=1024,
                                      k_chunk=128)

    if args.render_only:
        if v != 1:
            raise SystemExit(
                "--render_only measures per-frame serving latency and "
                "always renders one view; --num_views applies to the "
                "train-step benchmark only")
        import functools
        from splatfields_tpu.render_lib import _render_jit
        render = functools.partial(
            _render_jit, net=deform.net, width=width, height=height,
            sh_degree=0, field_mode=True, n_frames=n_frames,
            tile_size=pipe_cfg.tile_size, tile_cap=pipe_cfg.tile_cap,
            k_chunk=pipe_cfg.k_chunk, dup_factor=pipe_cfg.dup_factor)
        fv = deform.variables
        stats_valid = stats.valid
        w2v0, full0, campos0 = w2vs[0], fulls[0], camposs[0]
        tf = jnp.asarray(tanfov, jnp.float32)
        bg = jnp.ones(3, jnp.float32)
        fid = jnp.asarray(0.37, jnp.float32)

        w2vj, fullj, camposj = (jnp.asarray(w2v0), jnp.asarray(full0),
                                jnp.asarray(campos0))

        @jax.jit
        def one(carry):
            # ONE dispatch per frame (each relay round-trip costs ms);
            # carry perturbs the camera position -> next render depends on
            # the previous one (no dispatch-ahead mirage), and nothing is
            # loop-invariant across calls
            # multiplicative so the perturbation NEVER rounds away: at
            # campos~4.0 an additive 1e-9 is below f32 eps (~5e-7) and
            # successive calls become bitwise-identical (relay-cached,
            # CLAUDE.md pitfall 1); 1 + 1e-5*carry moves campos by ~4e-5
            campos = camposj * (1.0 + 1e-5 * carry)
            out = render(params, stats_valid, fv, w2vj, fullj, campos,
                         tf, tf, bg, fid)
            return jnp.full((3,), jnp.sum(out.color) * 1e-6, jnp.float32)

        if args.render_batch > 1:
            # offline-throughput row (render CLI --render_batch): K frames
            # per dispatch; the carry chains frame-to-frame INSIDE the
            # scan and dispatch-to-dispatch outside it, so every frame
            # stays sequentially dependent (no dispatch-ahead mirage)
            kb = args.render_batch

            @jax.jit
            def onek(carry):
                def body(c, _):
                    campos = camposj * (1.0 + 1e-5 * c)
                    out = render(params, stats_valid, fv, w2vj, fullj,
                                 campos, tf, tf, bg, fid)
                    return jnp.full((3,), jnp.sum(out.color) * 1e-6,
                                    jnp.float32), None
                c, _ = jax.lax.scan(body, carry, None, length=kb)
                return c

            one = onek
        carry = one(jnp.zeros(3, jnp.float32))
        _ = float(carry[0])  # compile + materialize
        t0 = time.perf_counter()
        for _i in range(args.iters):
            carry = one(carry)
        _ = float(carry[0])
        frames = args.iters * max(1, args.render_batch)
        dt = (time.perf_counter() - t0) / frames
        rec = {
            "metric": "render_rays_per_sec",
            "value": round(width * height / dt, 1),
            "unit": "rays/s/chip",
            "step_ms": round(dt * 1000, 2),
            "n_splats": n,
            "resolution": f"{width}x{height}",
            "variant": args.variant,
            "device": str(jax.devices()[0]),
        }
        if args.render_batch > 1:
            rec["render_batch"] = args.render_batch
        print(json.dumps(rec))
        return

    if args.scan_k > 0:
        k = args.scan_k
        sstep = train_lib.make_scanned_train_step(
            deform.net, opt_cfg, pipe_cfg, width, height, num_views=v,
            field_mode=True, n_frames=n_frames, sh_degree=0, k=k)
        kw2vs, kfulls, kcamposs, _ = make_views(k * v)
        batches = {
            "viewmatrix": jnp.asarray(kw2vs.reshape(k, v, 4, 4)),
            "projmatrix": jnp.asarray(kfulls.reshape(k, v, 4, 4)),
            "campos": jnp.asarray(kcamposs.reshape(k, v, 3)),
            "tanfovx": jnp.full((k, v), tanfov, jnp.float32),
            "tanfovy": jnp.full((k, v), tanfov, jnp.float32),
            "fid": jnp.full((k,), 0.37, jnp.float32),
            "image": jnp.asarray(
                rng.rand(k, v, 3, height, width).astype(np.float32)),
            "mask": jnp.zeros((k, v, 1, 1, 1), jnp.float32),
            "depth": jnp.zeros((k, v, 1, 1), jnp.float32),
            "bg": jnp.ones((k, 3), jnp.float32),
        }
        lrs1 = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
        lrs = jax.tree.map(lambda x: jnp.broadcast_to(x, (k,)), lrs1)
        flrs = jnp.full((k,), 1e-3, jnp.float32)
        key = jax.random.PRNGKey(0)
        fv = deform.variables
        fo = deform.opt_state
        out = sstep(params, stats, splat_opt, fv, fo, batches, lrs,
                    flrs, key)
        params, stats, splat_opt, fp, fo, losses, _l1, _aux, key = out
        fv = dict(fv, params=fp)
        _ = float(losses[-1])  # compile + materialize
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, stats, splat_opt, fp, fo, losses, _l1, _aux, key = sstep(
                params, stats, splat_opt, fv, fo, batches, lrs,
                flrs, key)
            fv = dict(fv, params=fp)
        _ = float(losses[-1])
        dt = (time.perf_counter() - t0) / (args.iters * k)
        rays_s = v * width * height / dt
        print(json.dumps({
            "metric": "rays_per_sec_fwd_bwd",
            "value": round(rays_s, 1),
            "unit": "rays/s/chip",
            "vs_baseline": round(rays_s / BASELINE_RAYS_S, 3),
            "step_ms": round(dt * 1000, 2),
            "scan_k": k,
            "n_splats": n,
            "resolution": f"{width}x{height}",
            "variant": args.variant,
            "num_views": v,
            "device": str(jax.devices()[0]),
        }))
        return

    step = train_lib.make_train_step(
        deform.net, opt_cfg, pipe_cfg, width, height, num_views=v,
        field_mode=True, n_frames=n_frames, sh_degree=0)

    batch = {
        "viewmatrix": jnp.asarray(w2vs),
        "projmatrix": jnp.asarray(fulls),
        "campos": jnp.asarray(camposs),
        "tanfovx": jnp.full((v,), tanfov, jnp.float32),
        "tanfovy": jnp.full((v,), tanfov, jnp.float32),
        "fid": jnp.asarray(0.37, jnp.float32),
        "image": jnp.asarray(
            rng.rand(v, 3, height, width).astype(np.float32)),
        "mask": jnp.zeros((v, 1, 1, 1), jnp.float32),
        "depth": jnp.zeros((v, 1, 1), jnp.float32),
        "bg": jnp.ones(3, jnp.float32),
    }
    lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
    key = jax.random.PRNGKey(0)
    fv = deform.variables
    fo = deform.opt_state

    # warm up / compile
    out = step(params, stats, splat_opt, fv, fo, batch, lrs,
               jnp.asarray(1e-3, jnp.float32), key)
    params, stats, splat_opt, fp, fo, res, key = out
    fv = dict(fv, params=fp)
    jax.block_until_ready(res.loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, stats, splat_opt, fp, fo, res, key = step(
            params, stats, splat_opt, fv, fo, batch, lrs,
            jnp.asarray(1e-3, jnp.float32), key)
        fv = dict(fv, params=fp)
    jax.block_until_ready(res.loss)
    dt = (time.perf_counter() - t0) / args.iters

    rays_s = v * width * height / dt
    rec = {
        "metric": "rays_per_sec_fwd_bwd",
        "value": round(rays_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_s / BASELINE_RAYS_S, 3),
        "step_ms": round(dt * 1000, 2),
        "n_splats": n,
        "resolution": f"{width}x{height}",
        "device": str(jax.devices()[0]),
    }
    if args.variant != "field" or v != 1:
        rec["variant"] = args.variant
        rec["num_views"] = v
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
