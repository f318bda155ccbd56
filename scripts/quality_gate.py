"""Committed PSNR quality gate for perf/numerics changes (VERDICT r2 #2).

The reference's only QA is metric-driven e2e training
(/root/reference/train.py:350-443, render.py:182-208); every remaining
perf milli-second here is won near numerics (bf16 packs, lower-precision
blends), so this gate makes reconstruction quality a committed, regressable
artifact the same way ``kernel_numerics.json`` does for kernel math.

Protocol (deterministic, no dataset needed):
1. Synthesize a "true" scene of 3k gaussians with a smooth color field and
   render 10 orbit views (8 train / 2 held-out) with the **XLA** blend
   (``blend_impl='jax'``) — ground truth is independent of the Pallas
   kernel and of any experimental numerics knob.
2. Train the bench config's field mode (VarTriPlaneEncoder + MLP heads)
   from a random point cloud for a fixed budget (default 300 iters)
   through the DEFAULT production path (Pallas blend on TPU).
3. PSNR on the held-out views -> ``quality_gate.json``; FAIL if below the
   stored baseline minus epsilon (0.3 dB).

Usage:
    python scripts/quality_gate.py               # check vs stored baseline
    python scripts/quality_gate.py --set-baseline  # record a new baseline
    SPLATFIELDS_PLANE_BF16=on python scripts/quality_gate.py   # knob A/B

Run on the real TPU (single process); ~330 steps + 2 renders. On CPU it
shrinks the scene and only smoke-checks the plumbing (no artifact write).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import math
import time

import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

EPSILON_DB = 0.3
GATE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "quality_gate.json")


def _orbit_camera(azimuth, elevation, radius, fov, width, height):
    """Camera on an orbit looking at the origin (3DGS conventions: R is the
    cam->world rotation, t the world->cam translation)."""
    from splatfields_tpu.utils import camera_math as cm
    p = np.array([
        radius * math.cos(elevation) * math.sin(azimuth),
        radius * math.sin(elevation),
        radius * math.cos(elevation) * math.cos(azimuth),
    ], np.float32)
    fwd = -p / np.linalg.norm(p)
    up0 = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up0, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd], axis=1).astype(np.float32)  # c2w
    t = (-R.T @ p).astype(np.float32)
    w2v = cm.get_world2view(R, t).T
    proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
    full = (w2v @ proj).astype(np.float32)
    campos = np.linalg.inv(w2v.T)[:3, 3].astype(np.float32)
    return w2v.astype(np.float32), full, campos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set-baseline", action="store_true")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=42,
                    help="scene/init seed (A/B spread probe; shapes are "
                         "seed-independent so no recompile)")
    ap.add_argument("--no-artifact", action="store_true",
                    help="print the result without touching "
                         "quality_gate.json (for seed-spread probes)")
    ap.add_argument("--num_views", type=int, default=1,
                    help="views per train step (the reference's "
                         "--all_training --num_views protocol, train.py:"
                         "157-163) — the multi-view bench headline shape; "
                         "gate artifact gains an _mv suffix when > 1. "
                         "With --variant owlii4d the scene becomes "
                         "n_frames x num_views same-fid view groups "
                         "(run_owlii.sh trains 5/frame)")
    ap.add_argument("--variant", choices=("field", "owlii4d", "ngp"),
                    default="field",
                    help="owlii4d: dynamic scene (rigidly rotating cloud "
                         "over n_frames times), 4D model (ResField rank-40 "
                         "lookup + offset flow, run_owlii.sh shape); gate "
                         "artifact quality_gate_4d.json. ngp: static scene, "
                         "HashGrid+MLP backbone (scene/ngpFields.py); gate "
                         "artifact quality_gate_ngp.json")
    args = ap.parse_args()

    on_tpu = jax.default_backend() != "cpu"
    width = height = 400 if on_tpu else 64
    n_true = 3000 if on_tpu else 256
    n_splats = 20_000 if on_tpu else 512
    iters = args.iters if on_tpu else 5
    n_frames = 6 if args.variant == "owlii4d" else 0

    from splatfields_tpu import config as cfg_lib
    from splatfields_tpu import train_lib
    from splatfields_tpu.models import splats as splats_lib
    from splatfields_tpu.models.deform_model import DeformModel
    from splatfields_tpu.ops.raster.api import rasterize
    from splatfields_tpu.ops.ssim import psnr as psnr_fn

    rng = np.random.RandomState(args.seed)
    fov = 0.8
    tanfov = math.tan(fov / 2)

    # --- the "true" scene: smooth color field over a gaussian cloud ---
    pts = rng.uniform(-0.7, 0.7, (n_true, 3)).astype(np.float32)
    cols = (0.5 + 0.5 * np.sin(
        3.0 * pts + np.array([0.0, 2.1, 4.2], np.float32))).astype(
            np.float32)
    scales = np.full((n_true, 3), 0.035, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n_true, 1))
    opac = np.full((n_true,), 0.8, np.float32)
    bg = np.zeros(3, np.float32)

    nv = max(1, args.num_views)
    # owlii4d: view v observes the scene at time t_v (a rigid rotation +
    # bob of the same cloud) — a dynamic reconstruction problem the static
    # field cannot fit, exercising ResField deltas + flow end-to-end.
    if n_frames and nv > 1:
        # the reference's Owlii protocol shape: nv same-fid views per
        # FRAME (train.py:157-163 batches by_fid groups; run_owlii.sh
        # uses 5) + one held-out azimuth at the first and last frame
        cam_specs = []                      # (az, el, fid, split)
        for f in range(n_frames):
            t = f / (n_frames - 1)
            for j in range(nv):
                i = f * nv + j
                cam_specs.append((2 * math.pi * i / (n_frames * nv),
                                  0.35 * math.sin(2.0 * i), t, "train"))
        for f in (0, n_frames - 1):
            cam_specs.append((1.7, -0.25, f / (n_frames - 1), "test"))
    else:
        cam_specs = []
        for v in range(10):
            fid = (v % n_frames) / (n_frames - 1) if n_frames else 0.0
            if on_tpu:
                split = "train" if v < 8 else "test"
            else:
                split = "train" if v < 2 else ("test" if v == 2 else "skip")
            cam_specs.append((2 * math.pi * v / 10,
                              0.35 * math.sin(2.0 * v), fid, split))
    n_views = len(cam_specs)
    fids = [s[2] for s in cam_specs]

    def pts_at(t):
        if not n_frames:
            return pts
        th = 0.5 * t
        c, s = math.cos(th), math.sin(th)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        off = np.array([0.0, 0.15 * math.sin(2 * math.pi * t), 0.0],
                       np.float32)
        return pts @ R.T + off

    cams, gts = [], []
    for v, (az, el, fid, _split) in enumerate(cam_specs):
        w2v, full, campos = _orbit_camera(az, el, 4.0, fov, width, height)
        cams.append((w2v, full, campos))
        out = rasterize(
            jnp.asarray(pts_at(fid)), jnp.asarray(scales),
            jnp.asarray(rots),
            jnp.asarray(opac), jnp.asarray(w2v), jnp.asarray(full),
            jnp.asarray(campos), jnp.asarray(bg), tanfov, tanfov,
            width, height, colors_precomp=jnp.asarray(cols),
            blend_impl="jax")   # GT independent of the Pallas path
        gts.append(np.asarray(out.color))
    train_v = [v for v, s in enumerate(cam_specs) if s[3] == "train"]
    test_v = [v for v, s in enumerate(cam_specs) if s[3] == "test"]

    # --- trainee: bench config (field mode) from a random cloud ---
    pts0 = rng.uniform(-0.8, 0.8, (n_splats, 3)).astype(np.float32)
    params, stats = splats_lib.create_from_pcd(
        pts0, np.abs(pts0), 0, capacity=n_splats)
    splat_opt = splats_lib.adam_init(params)
    if args.variant == "owlii4d":
        hidden = cfg_lib.HiddenConfig(
            encoder_type="VarTriPlaneEncoder", composition_rank=40,
            n_frames=n_frames, flow_model="offset")
    elif args.variant == "ngp":
        hidden = cfg_lib.HiddenConfig(
            encoder_type="NGPMLP", composition_rank=0, n_frames=0)
    else:
        hidden = cfg_lib.HiddenConfig(
            encoder_type="VarTriPlaneEncoder", composition_rank=0,
            n_frames=0)
    if not on_tpu and args.variant != "ngp":
        hidden.encoder_args = {"noise_res": 4}
    deform = DeformModel(hidden, radius=1.0)
    opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_norm=0.01)
    pipe_cfg = cfg_lib.PipelineConfig(
        tile_size=16, tile_cap=1024 if on_tpu else 256, k_chunk=128)
    step = train_lib.make_train_step(
        deform.net, opt_cfg, pipe_cfg, width, height, num_views=nv,
        field_mode=True, n_frames=n_frames, sh_degree=0)
    lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
    key = jax.random.PRNGKey(0)
    fv = deform.variables
    fo = deform.opt_state

    def make_batch(views):
        """views: list of SAME-FID camera indices batched into one step
        (multi-view steps require same fid — reference train.py:157-163
        batches by_fid groups)."""
        w2v = np.stack([cams[v][0] for v in views])
        full = np.stack([cams[v][1] for v in views])
        campos = np.stack([cams[v][2] for v in views])
        m = len(views)
        return {
            "viewmatrix": jnp.asarray(w2v),
            "projmatrix": jnp.asarray(full),
            "campos": jnp.asarray(campos),
            "tanfovx": jnp.full((m,), tanfov, jnp.float32),
            "tanfovy": jnp.full((m,), tanfov, jnp.float32),
            "fid": jnp.asarray(fids[views[0]], jnp.float32),
            "image": jnp.asarray(np.stack([gts[v] for v in views])),
            "mask": jnp.zeros((m, 1, 1, 1), jnp.float32),
            "depth": jnp.zeros((m, 1, 1), jnp.float32),
            "bg": jnp.asarray(bg),
        }

    if nv > 1 and n_frames:
        # one group per FRAME (all nv cameras of that frame share its fid)
        groups = [train_v[f * nv:(f + 1) * nv] for f in range(n_frames)]
        batches = {g: make_batch(views) for g, views in enumerate(groups)}
        sel = lambda it: it % len(groups)
    elif nv > 1:
        # rotate through view groups so all 8 train views are seen
        groups = [[train_v[(g + j) % len(train_v)] for j in range(nv)]
                  for g in range(len(train_v))]
        batches = {g: make_batch(views) for g, views in enumerate(groups)}
        sel = lambda it: it % len(groups)
    else:
        batches = {v: make_batch([v]) for v in train_v}
        sel = lambda it: train_v[it % len(train_v)]

    t0 = time.time()
    for it in range(iters):
        params, stats, splat_opt, fp, fo, res, key = step(
            params, stats, splat_opt, fv, fo, batches[sel(it)], lrs,
            jnp.asarray(1e-3, jnp.float32), key)
        fv = dict(fv, params=fp)
    final_loss = float(res.loss)
    train_s = time.time() - t0

    # --- held-out PSNR through the production render path ---
    from splatfields_tpu.render_lib import _render_jit
    psnrs = []
    for v in test_v:
        w2v, full, campos = cams[v]
        out = _render_jit(
            params, stats.valid, fv,
            jnp.asarray(w2v), jnp.asarray(full), jnp.asarray(campos),
            jnp.asarray(tanfov, jnp.float32), jnp.asarray(tanfov, jnp.float32),
            jnp.asarray(bg), jnp.asarray(fids[v], jnp.float32),
            net=deform.net, width=width, height=height, sh_degree=0,
            field_mode=True, n_frames=n_frames, tile_size=pipe_cfg.tile_size,
            tile_cap=pipe_cfg.tile_cap, k_chunk=pipe_cfg.k_chunk,
            dup_factor=pipe_cfg.dup_factor)
        img = jnp.clip(out.color, 0.0, 1.0)
        psnrs.append(float(psnr_fn(img, jnp.clip(jnp.asarray(gts[v]), 0, 1))))
    psnr = float(np.mean(psnrs))

    # COMPOSE the artifact suffixes: "--variant ngp --num_views 4" must not
    # clobber the single-view ngp gate with a non-comparable multi-view row
    # (round-5 review finding)
    suffix = ""
    if args.variant == "owlii4d":
        suffix += "_4d"
    elif args.variant == "ngp":
        suffix += "_ngp"
    if nv > 1:
        suffix += "_mv"
    gate_path = GATE_PATH.replace(".json", suffix + ".json")
    result = {
        "variant": args.variant,
        "num_views": nv,
        "psnr_db": round(psnr, 3),
        "per_view": [round(p, 3) for p in psnrs],
        "final_loss": round(final_loss, 5),
        "iters": iters,
        "resolution": f"{width}x{height}",
        "n_splats": n_splats,
        "train_s": round(train_s, 1),
        "device": str(jax.devices()[0]),
        "env_knobs": {k: v for k, v in os.environ.items()
                      if k.startswith("SPLATFIELDS_")},
    }

    if not on_tpu:
        print(json.dumps({"smoke_ok": True, **result}))
        return 0
    if args.no_artifact:
        print(json.dumps({"seed": args.seed, **result}))
        return 0

    baseline = None
    if os.path.exists(gate_path):
        with open(gate_path) as f:
            baseline = json.load(f).get("baseline_psnr_db")
    if args.set_baseline or baseline is None:
        artifact = {"baseline_psnr_db": result["psnr_db"],
                    "epsilon_db": EPSILON_DB, "latest": result,
                    "pass": True}
        with open(gate_path, "w") as f:
            json.dump(artifact, f, indent=2)
        print(json.dumps(artifact))
        return 0

    ok = psnr >= baseline - EPSILON_DB
    artifact = {"baseline_psnr_db": baseline, "epsilon_db": EPSILON_DB,
                "latest": result, "pass": bool(ok)}
    with open(gate_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
