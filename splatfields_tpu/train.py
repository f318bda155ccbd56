"""Training entry point (CLI) — ``python -m splatfields_tpu.train``.

Parity target: reference ``train.py`` (``training()``, :103-324): random
camera order, warm-up/static dispatch, the all_training same-fid view
batches, SH-degree bumping every 1000 iters, densification cadence,
overwrite_loc, periodic eval + checkpointing, best-PSNR tracking.

TPU structure: the per-iteration work is one jitted step (train_lib); the
host picks cameras, stages view batches, drives densification (growing
splat capacity and re-jitting only when the padded capacity overflows) and
writes checkpoints/metrics.
"""
from __future__ import annotations

import os
import random
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu import config as cfg_lib
from splatfields_tpu import train_lib
from splatfields_tpu.data.cameras import stack_cameras
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.ops.ssim import psnr as psnr_fn
from splatfields_tpu.scene import Scene
from splatfields_tpu.utils.schedules import expon_lr_func


def build_view_batch(cams, num_views, bg, with_mask, with_depth):
    """Stack up to num_views cameras into one device batch (pad by repeat)."""
    sel = list(cams)
    while len(sel) < num_views:
        sel.append(sel[-1])
    sel = sel[:num_views]
    stacked = stack_cameras(sel)
    h, w = sel[0].image_height, sel[0].image_width
    imgs = np.stack([
        c.image if c.image is not None else np.zeros((3, h, w), np.float32)
        for c in sel])
    batch = {
        "viewmatrix": jnp.asarray(stacked["viewmatrix"]),
        "projmatrix": jnp.asarray(stacked["projmatrix"]),
        "campos": jnp.asarray(stacked["campos"]),
        "tanfovx": jnp.asarray(stacked["tanfovx"]),
        "tanfovy": jnp.asarray(stacked["tanfovy"]),
        "fid": jnp.asarray(sel[0].fid, jnp.float32),
        "image": jnp.asarray(imgs),
        "bg": jnp.asarray(bg),
    }
    if with_mask:
        batch["mask"] = jnp.asarray(np.stack([
            c.mask if c.mask is not None else np.ones((1, h, w), np.float32)
            for c in sel]))
    else:
        batch["mask"] = jnp.zeros((num_views, 1, 1, 1))
    if with_depth:
        batch["depth"] = jnp.asarray(np.stack([
            c.depth if c.depth is not None else np.zeros((h, w), np.float32)
            for c in sel]))
    else:
        batch["depth"] = jnp.zeros((num_views, 1, 1))
    return batch


def training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg, test_iterations,
             save_iterations, args=None, quiet=False,
             progress_callback=None, resume=False, mesh=None, ring=False,
             scan_k=0, watchdog_min=0.0):
    """``mesh``: optional ('data', 'model') jax.sharding.Mesh — train with
    the sharded step (parallel/step.py) instead of the single-device one.
    Requires ``n_splats == -1`` (no subsampling) and ``num_views``
    divisible by the data axis; capacity is rounded up to the model axis.
    ``ring``: exchange Gaussian blocks around the model ring instead of
    all_gathering the full attribute set (parallel/ring.py — for N too
    large to replicate).
    ``scan_k``: if > 1, run k iterations per device dispatch via
    ``lax.scan`` (train_lib.make_scanned_train_step) whenever the window
    crosses no host decision point (densify / eval / save / SH bump /
    warm-up / overwrite-activation boundary) — amortizes the relay's
    per-dispatch cost; bit-identical math (tests/test_loss_paths.py::
    TestScannedStep). Single-device only; disabled when a
    progress_callback needs per-iteration state. The CLI defaults to
    k=4 for runs >= 500 iterations (auto-off below: the scanned
    program's ~4x compile time never amortizes on short runs)."""
    n_frames = model_cfg.load_time_step if model_cfg.load_time_step > 1 else 0
    hidden_cfg.n_frames = n_frames
    is_static = model_cfg.is_static
    enable_g_opt = not opt_cfg.disable_gaussian_opt

    if model_cfg.model_path:
        os.makedirs(model_cfg.model_path, exist_ok=True)
        if args is not None:
            cfg_lib.save_cfg_args(model_cfg.model_path, args)

    scene = Scene(model_cfg, capacity_multiplier=1.0 if is_static else 1.0)
    deform = None
    if not is_static:
        deform = DeformModel(hidden_cfg, radius=scene.cameras_extent)
        deform.train_setting(opt_cfg)

    params, stats = scene.splats, scene.splat_stats
    splat_opt = splats_lib.adam_init(params)
    if mesh is not None:
        from splatfields_tpu.parallel import step as pstep
        if opt_cfg.n_splats > 0:
            raise ValueError("--n_splats subsampling is not supported with "
                             "a device mesh (pass -1); see parallel/step.py")
        n_model = mesh.shape["model"]
        if params.capacity % n_model:
            params, stats, splat_opt = _grow_capacity(
                params, stats, splat_opt,
                -(-params.capacity // n_model) * n_model)
        params, stats, splat_opt = pstep.shard_train_state(
            params, stats, splat_opt, mesh)
    xyz_sched = expon_lr_func(
        lr_init=opt_cfg.position_lr_init * 5.0,
        lr_final=opt_cfg.position_lr_final * 5.0,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps)

    bg = np.array([1, 1, 1] if model_cfg.white_background else [0, 0, 0],
                  np.float32)

    train_cams = scene.get_train_cameras()
    h, w = train_cams[0].image_height, train_cams[0].image_width
    with_mask = opt_cfg.lambda_mask > 0 and train_cams[0].mask is not None
    with_depth = (opt_cfg.lambda_depth > 0 or opt_cfg.lambda_depthl1 > 0) \
        and train_cams[0].depth is not None
    if opt_cfg.lambda_mask > 0 and train_cams[0].mask is None:
        with_mask = False

    by_fid = defaultdict(list)
    for c in train_cams:
        by_fid[c.fid].append(c)

    num_views = 1
    if opt_cfg.all_training:
        num_views = min(opt_cfg.num_views, max(len(v) for v in by_fid.values()))

    from splatfields_tpu.utils.metrics_writer import MetricsWriter
    writer = MetricsWriter(model_cfg.model_path)

    rng = jax.random.PRNGKey(0)
    step_cache = {}
    scanned_cache = {}   # scan_k windows (train_lib.make_scanned_train_step)
    densify_cache = {}   # (size_thr, capacity) -> sharded densify jit

    def _opt_eff():
        # mask-loss path requires masks; disable if absent
        if not with_mask and opt_cfg.lambda_mask > 0:
            import dataclasses as dc
            return dc.replace(opt_cfg, lambda_mask=0.0)
        return opt_cfg

    def get_step(field_mode, sh_deg):
        key = (field_mode, sh_deg, params.capacity, pipe_cfg.dup_factor)
        if key not in step_cache:
            opt_eff = _opt_eff()
            if mesh is not None:
                from splatfields_tpu.parallel import step as pstep
                n_data = mesh.shape["data"]
                if num_views % n_data:
                    raise ValueError(
                        f"num_views {num_views} must divide by the data "
                        f"axis {n_data}")
                sstep = pstep.make_sharded_train_step(
                    deform.net if deform else None, opt_eff, pipe_cfg, w, h,
                    num_views // n_data, field_mode, n_frames, mesh, sh_deg,
                    enable_gaussian_opt=enable_g_opt, ring=ring)

                def step(p, s, so, fv, fo, batch, lrs, flr, rng):
                    return (*sstep(p, s, so, fv, fo, batch, lrs, flr), rng)

                step_cache[key] = step
            else:
                step_cache[key] = train_lib.make_train_step(
                    deform.net if deform else None, opt_eff, pipe_cfg, w, h,
                    num_views, field_mode, n_frames, sh_deg,
                    n_splats=opt_cfg.n_splats,
                    enable_gaussian_opt=enable_g_opt)
        return step_cache[key]

    def get_scanned(field_mode, sh_deg, overwrite):
        key = (field_mode, sh_deg, params.capacity, pipe_cfg.dup_factor,
               overwrite)
        if key not in scanned_cache:
            scanned_cache[key] = train_lib.make_scanned_train_step(
                deform.net if deform else None, _opt_eff(), pipe_cfg, w, h,
                num_views, field_mode, n_frames, sh_deg, k=scan_k,
                overwrite_loc=overwrite, n_splats=opt_cfg.n_splats,
                enable_gaussian_opt=enable_g_opt)
        return scanned_cache[key]

    test_set, save_set = set(test_iterations), set(save_iterations)

    def _field_mode_at(j):
        return (not is_static) and not (
            opt_cfg.warm_up is not None and 0 < opt_cfg.warm_up
            and j < opt_cfg.warm_up)

    def _scan_window_ok(i):
        """Can iterations [i, i+scan_k) run as one scanned dispatch?"""
        if scan_k < 2 or mesh is not None or progress_callback is not None:
            return False
        end = i + scan_k - 1
        if end > opt_cfg.iterations:
            return False
        fm = _field_mode_at(i)
        over0 = opt_cfg.overwrite_loc and fm and i > 1500
        for j in range(i, end + 1):
            if j in test_set or j in save_set:
                return False
            if enable_g_opt and j % 1000 == 0:
                return False  # SH-bump boundary
            if _field_mode_at(j) != fm:
                return False  # warm-up boundary
            if (enable_g_opt and j < opt_cfg.densify_until_iter
                    and j > opt_cfg.densify_from_iter
                    and j % opt_cfg.densification_interval == 0):
                return False  # densify boundary
            if (opt_cfg.overwrite_loc and fm and (j > 1500) != over0):
                return False  # overwrite_loc activation boundary
        return True

    watchdog = None
    if watchdog_min and watchdog_min > 0:
        # relay-stall recovery (utils/system.StallWatchdog): a hung device
        # call cannot be interrupted; exit 114 so a supervisor restarts
        # with --resume from the latest checkpoint
        from splatfields_tpu.utils.system import StallWatchdog
        watchdog = StallWatchdog(watchdog_min).start()

    active_sh = 0
    ema_loss = 0.0
    best_psnr, best_iter = 0.0, 0
    viewpoint_stack = []
    t_start = time.time()
    times = []
    start_iteration = 1
    skip = 0

    if resume and model_cfg.model_path:
        from splatfields_tpu import checkpointing
        template = {
            "splat_params": params, "splat_stats": stats,
            "splat_opt": splat_opt,
            "field_vars": deform.variables if deform else {"params": {}},
            "field_opt": deform.opt_state if deform
            else splats_lib.adam_init({}),
            "rng": rng,
        }
        restored = checkpointing.load_train_state(
            model_cfg.model_path, template)
        if restored is not None:
            state, it0 = restored
            params = state["splat_params"]
            stats = state["splat_stats"]
            splat_opt = state["splat_opt"]
            if deform:
                deform.variables = state["field_vars"]
                deform.opt_state = state["field_opt"]
            rng = state["rng"]
            start_iteration = it0 + 1
            active_sh = min((it0 // 1000), model_cfg.sh_degree) \
                if enable_g_opt else 0
            print(f"Resumed training state at iteration {it0}")

    def _next_batch(j):
        nonlocal viewpoint_stack
        if not viewpoint_stack:
            viewpoint_stack = list(train_cams)
        vp = viewpoint_stack[random.randint(0, len(viewpoint_stack) - 1)]
        if opt_cfg.all_training:
            cam_list = list(by_fid[vp.fid])
            random.shuffle(cam_list)
        else:
            cam_list = [vp]
        b = build_view_batch(cam_list, num_views, bg, with_mask, with_depth)
        if opt_cfg.corr_interval > 1:
            # Moran budget knob: KNN+corr terms run on gated steps only
            # (train_lib.compute_losses scales them by the interval)
            b["corr_gate"] = jnp.asarray(
                1.0 if j % opt_cfg.corr_interval == 0 else 0.0,
                jnp.float32)
        return b

    def _lrs_at(j):
        return splats_lib.splat_lr_tree(
            xyz_sched(j) / 5.0, opt_cfg.feature_lr,
            opt_cfg.opacity_lr, opt_cfg.scaling_lr, opt_cfg.rotation_lr)

    for iteration in range(start_iteration, opt_cfg.iterations + 1):
        if watchdog is not None:
            watchdog.beat()
        if enable_g_opt and iteration % 1000 == 0:
            active_sh = min(active_sh + 1, model_cfg.sh_degree)
        if skip:
            skip -= 1
            continue

        if _scan_window_ok(iteration):
            # ---- k iterations in ONE dispatch (lax.scan window) ----
            fm = _field_mode_at(iteration)
            sh_deg = active_sh if not fm else 0
            over = opt_cfg.overwrite_loc and fm and iteration > 1500
            js = list(range(iteration, iteration + scan_k))
            batches = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[_next_batch(j) for j in js])
            lrs_k = jax.tree.map(
                lambda *xs: jnp.asarray(xs, jnp.float32),
                *[_lrs_at(j) for j in js])
            flrs = jnp.asarray(
                [deform.learning_rate(j) if (deform and fm) else 0.0
                 for j in js], jnp.float32)
            sstep = get_scanned(fm, sh_deg, over)
            field_vars = deform.variables if (deform and fm) \
                else {"params": {}}
            field_opt = deform.opt_state if deform \
                else splats_lib.adam_init({})
            t0 = time.time()
            (params, stats, splat_opt, new_fp, new_fo, losses, l1s, aux,
             rng) = sstep(params, stats, splat_opt, field_vars, field_opt,
                          batches, lrs_k, flrs, rng)
            if deform and fm:
                deform.params = new_fp
                deform.opt_state = new_fo
            losses = np.asarray(losses)
            l1s = np.asarray(l1s)
            dt = (time.time() - t0) / scan_k
            total_pts = int(np.asarray(stats.valid).sum())
            for idx, j in enumerate(js):
                times.append(dt)
                ema_loss = 0.4 * float(losses[idx]) + 0.6 * ema_loss
                if j % 10 == 0:
                    log = {"train_loss_patches/total_loss": float(losses[idx]),
                           "train_loss_patches/l1_loss": float(l1s[idx]),
                           "iter_time": dt * 1000.0,
                           "total_points": total_pts}
                    for k2, v2 in aux.items():
                        if k2 not in ("l1",):
                            log[f"train_loss_patches/{k2}"] = \
                                float(np.asarray(v2)[idx])
                    writer.scalars(j, log)
                if j % 100 == 0 and not quiet:
                    print(f"iter {j}: loss {ema_loss:.5f} "
                          f"({np.mean(times[-50:]) * 1000:.1f} ms/it)",
                          flush=True)
            dropped = int(np.asarray(aux.get("bin_dropped", 0)).sum())
            if dropped > 0:
                import dataclasses as dc
                new_factor = max(pipe_cfg.dup_factor + 1,
                                 int(pipe_cfg.dup_factor * 1.5))
                print(f"iter {iteration}: {dropped} rasterizer instances "
                      f"beyond dup budget in scan window — growing "
                      f"dup_factor {pipe_cfg.dup_factor} -> {new_factor} "
                      f"(re-jit)", flush=True)
                pipe_cfg = dc.replace(pipe_cfg, dup_factor=new_factor)
                step_cache.clear()
                scanned_cache.clear()
            skip = scan_k - 1
            continue

        batch = _next_batch(iteration)

        field_mode = _field_mode_at(iteration)

        lrs = _lrs_at(iteration)
        field_lr = deform.learning_rate(iteration) if deform else 0.0

        step = get_step(field_mode, active_sh if not field_mode else 0)
        field_vars = deform.variables if (deform and field_mode) else {"params": {}}
        field_opt = deform.opt_state if deform else splats_lib.adam_init({})

        t0 = time.time()
        (params, stats, splat_opt, new_fp, field_opt_new, out, rng) = step(
            params, stats, splat_opt, field_vars, field_opt, batch, lrs,
            field_lr, rng)
        if deform and field_mode:
            deform.params = new_fp
            deform.opt_state = field_opt_new
        out_loss = float(out.loss)
        times.append(time.time() - t0)

        if iteration > 1500 and opt_cfg.overwrite_loc and field_mode:
            # copy field means back into _xyz (reference train.py:153-155).
            # DOCUMENTED DECISION: with --n_splats subsampling active the
            # step only predicts means for the sampled subset, so the copy
            # is skipped for that iteration (shape guard below). The
            # reference CRASHES in this combination (its _xyz.copy_ of a
            # subset tensor raises a size mismatch), so skipping is the
            # only behavior any working run can observe.
            import dataclasses as dc
            if out.means3d.shape[0] == params.xyz.shape[0]:
                # keep the capacity-axis sharding when training on a mesh
                m3d = jax.device_put(out.means3d, params.xyz.sharding)
                params = dc.replace(params, xyz=m3d)

        ema_loss = 0.4 * out_loss + 0.6 * ema_loss
        if iteration % 10 == 0:
            log = {"train_loss_patches/total_loss": out_loss,
                   "train_loss_patches/l1_loss": float(out.l1),
                   "iter_time": times[-1] * 1000.0,
                   "total_points": int(np.asarray(stats.valid).sum())}
            for k, v in out.loss_dict.items():
                if k not in ("l1",):
                    log[f"train_loss_patches/{k}"] = v
            writer.scalars(iteration, log)
        dropped = int(out.loss_dict.get("bin_dropped", 0))
        if dropped > 0:
            # grow the static duplicated-instance budget and re-jit (same
            # pattern as capacity growth) so no instances are lost
            import dataclasses as dc
            new_factor = max(pipe_cfg.dup_factor + 1,
                             int(pipe_cfg.dup_factor * 1.5))
            print(f"iter {iteration}: {dropped} rasterizer instances beyond "
                  f"dup budget — growing dup_factor "
                  f"{pipe_cfg.dup_factor} -> {new_factor} (re-jit)",
                  flush=True)
            pipe_cfg = dc.replace(pipe_cfg, dup_factor=new_factor)
            step_cache.clear()
        if iteration % 100 == 0:
            if not quiet:
                print(f"iter {iteration}: loss {ema_loss:.5f} "
                      f"({np.mean(times[-50:]) * 1000:.1f} ms/it)",
                      flush=True)

        # densification
        if enable_g_opt and iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                size_thr = 20.0 if iteration > opt_cfg.opacity_reset_interval else 0.0
                rng, drng = jax.random.split(rng)
                if mesh is not None:
                    # on-mesh global densify: same program as the host
                    # path, sharded in/out — no host round-trip of the
                    # splat state (parallel/step.py::make_sharded_densify)
                    from splatfields_tpu.parallel import step as pstep
                    dkey = (size_thr, params.capacity)
                    if dkey not in densify_cache:
                        densify_cache.clear()  # capacity grew: drop stale
                        densify_cache[dkey] = pstep.make_sharded_densify(
                            mesh, size_thr, opt_cfg.percent_dense)
                    params, stats, splat_opt, dropped = densify_cache[dkey](
                        params, stats, splat_opt, drng,
                        jnp.float32(opt_cfg.densify_grad_threshold),
                        jnp.float32(0.005),
                        jnp.float32(scene.cameras_extent))
                else:
                    params, stats, splat_opt, dropped = \
                        splats_lib.densify_and_prune(
                            params, stats, splat_opt, drng,
                            opt_cfg.densify_grad_threshold, 0.005,
                            scene.cameras_extent, size_thr,
                            percent_dense=opt_cfg.percent_dense)
                dropped = int(dropped)
                if dropped > 0:
                    # rare growth path: re-jit is unavoidable, so the host
                    # round-trip here is acceptable
                    new_cap = int(params.capacity * 1.5) + dropped
                    if mesh is not None:
                        unshard = lambda t: jax.tree.map(
                            lambda a: jnp.asarray(np.asarray(a)), t)
                        params, stats = unshard(params), unshard(stats)
                        splat_opt = unshard(splat_opt)
                        n_model = mesh.shape["model"]
                        new_cap = -(-new_cap // n_model) * n_model
                    params, stats, splat_opt = _grow_capacity(
                        params, stats, splat_opt, new_cap)
                    step_cache.clear()
                    if mesh is not None:
                        from splatfields_tpu.parallel import step as pstep
                        params, stats, splat_opt = pstep.shard_train_state(
                            params, stats, splat_opt, mesh)

        if iteration in test_iterations:
            cur = evaluate(scene, params, stats, deform, model_cfg,
                           pipe_cfg, opt_cfg, bg, active_sh, field_mode,
                           n_frames, iteration, quiet=quiet, writer=writer)
            if cur > best_psnr:
                best_psnr, best_iter = cur, iteration
        if iteration in save_iterations:
            if not quiet:
                print(f"[ITER {iteration}] saving")
            scene.save(iteration, params, stats)
            if deform:
                deform.save_weights(model_cfg.model_path, iteration)
            if model_cfg.model_path:
                from splatfields_tpu import checkpointing
                checkpointing.save_train_state(
                    model_cfg.model_path, iteration, params, stats,
                    splat_opt,
                    deform.variables if deform else {"params": {}},
                    deform.opt_state if deform else splats_lib.adam_init({}),
                    rng)
        if progress_callback:
            progress_callback(iteration, out_loss, params, stats)

    if watchdog is not None:
        watchdog.stop()
    total = time.time() - t_start
    writer.close()
    if not quiet:
        print(f"Best PSNR = {best_psnr} at iteration {best_iter}")
        print(f"Total {total:.1f}s, mean step "
              f"{np.mean(times[20:]) * 1000:.2f} ms")
    return params, stats, deform, best_psnr


def _grow_capacity(params, stats, opt, new_cap):
    """Enlarge the padded capacity (host-side, triggers re-jit)."""
    import dataclasses as dc

    def pad(a):
        out = np.zeros((new_cap,) + a.shape[1:], np.asarray(a).dtype)
        out[: a.shape[0]] = np.asarray(a)
        return jnp.asarray(out)

    params = jax.tree.map(pad, params)
    stats = dc.replace(
        stats, valid=pad(stats.valid), max_radii2d=pad(stats.max_radii2d),
        xyz_gradient_accum=pad(stats.xyz_gradient_accum),
        denom=pad(stats.denom))
    opt = splats_lib.AdamState(count=opt.count,
                               mu=jax.tree.map(pad, opt.mu),
                               nu=jax.tree.map(pad, opt.nu))
    return params, stats, opt


def evaluate(scene, params, stats, deform, model_cfg, pipe_cfg, opt_cfg,
             bg, active_sh, field_mode, n_frames, iteration, quiet=False,
             max_views=25, writer=None):
    """In-training eval (reference ``training_report``, train.py:350-443):
    L1/PSNR per camera set, render/gt/mask/depth panels for the first 5
    views of each set, opacity histogram + total_points."""
    from splatfields_tpu.render_lib import render_camera

    results = {}
    for name, cams in (("test", scene.get_test_cameras()),
                       ("train", scene.get_train_cameras()[:5])):
        if not cams:
            continue
        psnrs, l1s = [], []
        for idx, cam in enumerate(cams[:max_views]):
            out = render_camera(
                cam, params, stats, deform, pipe_cfg, bg,
                field_mode=field_mode, n_frames=n_frames,
                sh_degree=active_sh)
            img = out["render"]
            gt = jnp.clip(jnp.asarray(cam.image), 0, 1)
            img = jnp.clip(img, 0, 1)
            psnrs.append(float(psnr_fn(img, gt)))
            l1s.append(float(jnp.mean(jnp.abs(img - gt))))
            if writer is not None and idx < 5:
                panels = {"render": np.asarray(img), "gt": np.asarray(gt)}
                if cam.mask is not None:
                    gt_mask = np.asarray(cam.mask).reshape(
                        1, *np.asarray(gt).shape[-2:])
                    panels["render_mask"] = np.asarray(img) * gt_mask
                depth = np.asarray(out["depth"])[0]
                dmax = max(float(depth.max()), 9.0 + 1e-3)
                panels["depth"] = np.clip((depth - 9.0) / (dmax - 9.0), 0, 1)
                writer.images(iteration, f"{name}_view_{idx}", panels)
        results[name] = (np.mean(l1s), np.mean(psnrs))
        if writer is not None:
            # reference train.py:421-424 tb tags
            writer.scalars(iteration, {
                f"{name}/loss_viewpoint - l1_loss": results[name][0],
                f"{name}/loss_viewpoint - psnr": results[name][1],
            })
        if not quiet:
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {results[name][0]:.5f} PSNR {results[name][1]:.3f}")
    if writer is not None:
        valid = np.asarray(stats.valid)
        opac = np.asarray(splats_lib.get_opacity(params))[valid > 0]
        writer.histogram(iteration, "scene/opacity_histogram", opac)
        writer.scalars(iteration, {"total_points": float(valid.sum())})
    return results.get("test", results.get("train", (0, 0)))[1]


def main(argv=None):
    from splatfields_tpu.utils.system import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    parser = cfg_lib.build_parser("SplatFields-TPU training")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[i * 1000 for i in range(0, 120)]
                        + [100_000, 200_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[100, 500, 1000, 7000, 10000, 20000, 30000,
                                 40000, 100_000, 200_000])
    parser.add_argument("--configs", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest train_state ckpt")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of iterations "
                             "20-30 into <model_path>/trace")
    # --- multi-chip / multi-host (new layer, SURVEY 5.8) ---
    parser.add_argument("--mesh_model", type=int, default=0,
                        help="model-axis size of the ('data','model') device "
                             "mesh; 0 = single-device step (default)")
    parser.add_argument("--mesh_data", type=int, default=1,
                        help="data-axis size of the device mesh")
    parser.add_argument("--ring", action="store_true",
                        help="ring-exchange Gaussian blocks over the model "
                             "axis instead of all_gathering attributes "
                             "(for splat counts too large to replicate)")
    parser.add_argument("--scan_k", type=int, default=None,
                        help="iterations per device dispatch via lax.scan "
                             "(amortizes the ~1.6 ms/step relay dispatch "
                             "cost; windows crossing densify/eval/save/"
                             "SH-bump/warm-up boundaries fall back to "
                             "single steps — bit-identical math, "
                             "tests/test_train_e2e.py::TestScanK). "
                             "Default: 4 for runs >= 500 iterations, else "
                             "0 (the scanned program's ~4x compile never "
                             "amortizes on short runs). 0/1 = off; "
                             "auto-off on a device mesh or with --profile")
    parser.add_argument("--watchdog_min", type=float, default=0.0,
                        help="exit 114 if the training loop makes no "
                             "progress for this many minutes (relay-stall "
                             "recovery; supervisors restart with --resume)."
                             " Set ABOVE worst-case compile (~15 min for "
                             "the scanned step); 0 = off")
    parser.add_argument("--coordinator_address", type=str, default="",
                        help="host:port of process 0 (multi-host pods)")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="total jax processes (multi-host pods)")
    parser.add_argument("--process_id", type=int, default=0,
                        help="this process's index (multi-host pods)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)
    if args.configs:
        args = cfg_lib.merge_yaml_config(args, args.configs)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    mesh = None
    if args.num_processes > 1 or args.mesh_model > 0:
        from splatfields_tpu.parallel import mesh as mesh_lib
        mesh_lib.initialize_distributed(
            args.coordinator_address or None, args.num_processes or None,
            args.process_id)
        n_model = args.mesh_model or (len(jax.devices()) // args.mesh_data)
        mesh = mesh_lib.make_mesh(n_devices=n_model * args.mesh_data,
                                  data=args.mesh_data)
        print(f"Device mesh: data={args.mesh_data} model={n_model} "
              f"({args.num_processes} process(es))")

    model_cfg, pipe_cfg, hidden_cfg, opt_cfg = cfg_lib.extract_configs(args)
    print("Optimizing " + model_cfg.model_path)
    progress_callback = None
    if args.profile and model_cfg.model_path:
        trace_dir = os.path.join(model_cfg.model_path, "trace")

        def progress_callback(it, loss, p, s):
            if it == 20:
                jax.profiler.start_trace(trace_dir)
            elif it == 30:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {trace_dir}")

    scan_k = args.scan_k if args.scan_k is not None else (
        4 if args.iterations >= 500 else 0)
    training(model_cfg, hidden_cfg, opt_cfg, pipe_cfg,
             args.test_iterations, args.save_iterations, args=args,
             quiet=args.quiet, resume=args.resume,
             progress_callback=progress_callback, mesh=mesh,
             ring=args.ring, scan_k=scan_k,
             watchdog_min=args.watchdog_min)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
