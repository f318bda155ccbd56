"""Jitted training step for SplatFields-TPU.

Re-derives the reference training iteration (``train.py:140-322``) as one
XLA program per mode:

- **static / warm-up mode** (``get_gaussian_dict`` branch 1,
  ``train.py:41-50``): splat parameters rendered directly with SH colors —
  the classic-3DGS path (``--is_static``).
- **field mode** (branch 2, ``train.py:51-99``): xyz/scaling detached, the
  SplatFields net predicts attributes, scale delta added in activated
  space, color from the field (or the view-dependent head evaluated on
  per-splat view dirs).

One step = field forward (+ triplane CNN decode once) -> V renders (the
``all_training``/``num_views`` same-fid batch, ``train.py:157-163``) ->
loss assembly (all lambda terms, ``train.py:169-250``) -> grads -> two Adam
updates. Densification statistics use the LAST view's screen-space gradient
and visibility, faithfully reproducing the reference's loop-variable reuse
at ``train.py:280-307``.

Deviation (documented): the reference's depth-SSIM regularizer feeds
[H, W, 1] tensors into an SSIM that assumes [C, H, W], silently treating
image rows as channels (``train.py:221``). We compute a standard SSIM over
the [1, H, W] depth map instead; no released config enables lambda_depth.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.ops import knn as knn_ops
from splatfields_tpu.ops.raster.api import rasterize
from splatfields_tpu.ops.ssim import ssim as ssim_fn


class StepOut(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    loss_dict: dict
    radii: jnp.ndarray          # last view
    screen_grad: jnp.ndarray    # last view [N, 2]
    means3d: jnp.ndarray        # field-predicted means (for overwrite_loc)


def _subsample_idx(rng, valid, n_splats):
    """Random n_splats valid indices (reference ``train.py:56-60``):
    uniform keys pushed up for invalid entries, argsort, take first n."""
    keys = jax.random.uniform(rng, valid.shape) + (~valid) * 10.0
    order = jnp.argsort(keys)
    return order[:n_splats]


def field_attributes(net, variables, xyz, scaling, valid, fid, n_frames,
                     planes=None):
    """Field forward -> renderable attributes (reference ``train.py:51-85``)."""
    n = xyz.shape[0]
    t = None
    if n_frames > 0:
        t = jnp.broadcast_to(jnp.reshape(fid, (1, 1)), (n, 1))
    ret = net.apply(variables, xyz, t, planes=planes)
    out = {
        "means3d": ret["means3D"],
        "opacity": ret["opacity"][:, 0],
        "scales": ret["scales"] + scaling,   # additive in activated space
        "rotations": ret["rotations"],
        "valid": valid,
    }
    if "rgb" in ret:
        out["rgb"] = ret["rgb"]
    else:
        out["rgb_feat"] = ret["rgb_feat"]
    if ret.get("flow") is not None:
        out["flow"] = ret["flow"]
    if ret.get("gradient_error") is not None:
        # Pass-through for the lambda_gradient loss term (reference
        # train.py:70-76,247-250). No upstream field emits this key today,
        # but the wiring keeps parity if a custom net provides it.
        out["gradient_error"] = ret["gradient_error"]
    return out


def static_attributes(params: splats_lib.SplatParams, valid):
    return {
        "means3d": params.xyz,
        "opacity": splats_lib.get_opacity(params)[:, 0],
        "scales": splats_lib.get_scaling(params),
        "rotations": splats_lib.get_rotation(params),
        "shs": splats_lib.get_features(params),
        "valid": valid,
    }


def render_view(attrs, cam, bg, width, height, sh_degree, pipe, net=None,
                variables=None, screenspace_offset=None):
    """One rasterization from an attribute dict + stacked camera entry."""
    colors = attrs.get("rgb")
    shs = attrs.get("shs")
    if colors is None and "rgb_feat" in attrs:
        dirs = attrs["means3d"] - cam["campos"][None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        colors = net.apply(variables, attrs["rgb_feat"], dirs,
                           method=type(net).rgb_from_viewdir)
    return rasterize(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacity"],
        cam["viewmatrix"], cam["projmatrix"], cam["campos"], bg,
        cam["tanfovx"], cam["tanfovy"], width, height,
        colors_precomp=colors, shs=shs, sh_degree=sh_degree,
        valid_mask=attrs["valid"],
        screenspace_offset=screenspace_offset,
        tile_size=pipe.tile_size, tile_cap=pipe.tile_cap,
        k_chunk=pipe.k_chunk,
        dup_cap=getattr(pipe, "dup_factor", 8) * attrs["means3d"].shape[0],
    )


def _masked_mean(x, valid):
    v = valid.astype(x.dtype)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def compute_losses(render_outs, batch, attrs, opt, valid):
    """Per-view photometric + per-step regularizers. Returns (loss, aux)."""
    v_count = len(render_outs)
    loss_list, l1_list = [], []
    mask_l, depth_l, depthl1_l = [], [], []
    for v, out in enumerate(render_outs):
        gt = batch["image"][v]
        l1 = jnp.mean(jnp.abs(out.color - gt))
        loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (
            1.0 - ssim_fn(out.color, gt))
        if opt.lambda_mask > 0.0:
            alpha = jnp.clip(out.alpha, 0.0, 1.0)
            lm = jnp.mean(jnp.abs(alpha.reshape(-1)
                                  - batch["mask"][v].reshape(-1)))
            loss = loss + opt.lambda_mask * lm
            mask_l.append(lm)
        if opt.lambda_norm > 0.0:
            ln = _masked_mean(
                jnp.linalg.norm(attrs["means3d"], axis=1), valid)
            loss = loss + opt.lambda_norm * ln
        if opt.lambda_norm_mean > 0.0:
            mean_val = jax.lax.stop_gradient(
                jnp.sum(attrs["means3d"] * valid[:, None].astype(jnp.float32), 0)
                / jnp.maximum(jnp.sum(valid), 1))
            ln = _masked_mean(
                jnp.linalg.norm(attrs["means3d"] - mean_val[None], axis=1),
                valid)
            loss = loss + opt.lambda_norm_mean * ln
        if opt.lambda_depth > 0.0:
            gt_depth = batch["depth"][v]
            dmask = (gt_depth > 0).astype(jnp.float32)
            rnd = out.depth[0]
            ld = ssim_fn((rnd * dmask)[None], (gt_depth * dmask)[None])
            loss = loss + opt.lambda_depth * ld
            depth_l.append(ld)
        if opt.lambda_depthl1 > 0.0:
            gt_depth = batch["depth"][v]
            dmask = (gt_depth > 0).astype(jnp.float32)
            ld = jnp.mean(jnp.abs(out.depth[0] * dmask - gt_depth * dmask))
            loss = loss + opt.lambda_depthl1 * ld
            depthl1_l.append(ld)
        loss_list.append(loss)
        l1_list.append(l1)

    loss = sum(loss_list) / v_count
    aux = {"l1": sum(l1_list) / v_count}

    if opt.lambda_corr > 0.0 or opt.lambda_corr_color > 0.0:
        # View-invariant, so computed ONCE per step (the reference adds it
        # inside its per-view loop, train.py:203-215, but with identical
        # effect after the view average).
        def corr_term():
            pts = jnp.where(
                valid[:, None], attrs["means3d"],
                1e3 + jnp.arange(valid.shape[0],
                                 dtype=jnp.float32)[:, None])
            w, nn_ix = knn_ops.query_nn(jax.lax.stop_gradient(pts))
            nb_valid = valid[nn_ix].all(axis=1)

            def moran(feat):
                per = _neighborhood_morans(w, feat[nn_ix])
                return 1.0 - jnp.clip(
                    jnp.sum(per * nb_valid)
                    / jnp.maximum(jnp.sum(nb_valid), 1.0),
                    0.0, 1.0)

            # The reference's color Moran term runs over the flattened
            # ``gaussian_features`` [N, K*3] (``train.py:208``). In static /
            # warm-up mode that's the SH coefficient matrix; in field mode
            # with an rgb head the reference dict holds ``gaussian_rgb``
            # instead and the upstream access would KeyError — we use the
            # predicted rgb as the feature vector there (documented
            # deviation; no released config hits the upstream crash).
            feat_vec = None
            if "shs" in attrs:
                feat_vec = attrs["shs"].reshape(attrs["shs"].shape[0], -1)
            elif "rgb" in attrs:
                feat_vec = attrs["rgb"]
            term = jnp.zeros(())
            if opt.lambda_corr > 0.0:
                lc = (moran(attrs["scales"]) + moran(attrs["rotations"])
                      + moran(attrs["opacity"][:, None]))
                if feat_vec is not None:
                    lc = lc + moran(feat_vec)
                term = term + opt.lambda_corr * lc
            if opt.lambda_corr_color > 0.0 and feat_vec is not None:
                # reference quirk preserved: weighted by lambda_corr, not
                # lambda_corr_color (``train.py:215``)
                term = term + opt.lambda_corr * moran(feat_vec)
            return term

        interval = max(getattr(opt, "corr_interval", 1), 1)
        if interval > 1 and "corr_gate" in batch:
            # budget knob (--corr_interval k): run the O(N^2) KNN+Moran on
            # every k-th step only, scaled by k so the expected gradient
            # matches the every-step reference schedule. lax.cond executes
            # one branch at runtime, so gated-off steps skip the KNN cost.
            loss = loss + jax.lax.cond(
                batch["corr_gate"] > 0.0, corr_term,
                lambda: jnp.zeros(())) * jnp.float32(interval)
        else:
            loss = loss + corr_term()
    if mask_l:
        aux["mask"] = sum(mask_l) / len(mask_l)
    if depth_l:
        aux["depth"] = sum(depth_l) / len(depth_l)
    if depthl1_l:
        aux["depthl1"] = sum(depthl1_l) / len(depthl1_l)
    if opt.lambda_opacity > 0.0:
        lo = _masked_mean((attrs["opacity"] - 1.0) ** 2, valid)
        loss = loss + opt.lambda_opacity * lo
        aux["opacity"] = lo
    if opt.lambda_gradient > 0.0 and "gradient_error" in attrs:
        # Once per step, after the view average (reference train.py:247-250:
        # added to the already-averaged loss, guarded on the dict key).
        lg = attrs["gradient_error"]
        loss = loss + opt.lambda_gradient * lg
        aux["gradient"] = lg
    return loss, aux


def _neighborhood_morans(weights, feats_nn):
    """Per-neighborhood Moran's I (see ops.knn.morans_measure; returns the
    per-neighborhood mean over channels instead of the global mean so
    invalid neighborhoods can be masked)."""
    k = feats_nn.shape[1]
    w_total = jnp.sum(weights, axis=(1, 2))[:, None, None]
    w_ij = (k / jnp.maximum(w_total, 1e-12)) * weights
    denom = jnp.sum(feats_nn**2, axis=1)
    nom = jnp.einsum("bij,bif,bjf->bf", w_ij, feats_nn, feats_nn)
    return (nom / (denom + 1e-4)).mean(axis=-1)


def make_train_step(net, opt_cfg, pipe_cfg, width, height, num_views,
                    field_mode: bool, n_frames: int, sh_degree: int,
                    n_splats: int = -1, enable_gaussian_opt: bool = True,
                    use_planes: bool = True, jit: bool = True):
    """Build the jitted train step for one (mode, V, sh_degree) signature.

    ``jit=False`` returns the raw traceable step body (for embedding in a
    ``lax.scan``, see ``make_scanned_train_step``)."""

    has_encoder = net is not None and net.encoder_type in (
        "VarTriPlaneEncoder", "VarHexPlaneEncoder")

    def step(splat_params, splat_stats, splat_opt, field_vars, field_opt,
             batch, splat_lrs, field_lr, rng):
        valid = splat_stats.valid
        idx = None
        if field_mode and n_splats > 0:
            rng, sub = jax.random.split(rng)
            idx = _subsample_idx(sub, valid, n_splats)

        def loss_fn(sp, fp, offsets):
            variables = None
            if field_mode:
                variables = dict(field_vars, params=fp)
                xyz = jax.lax.stop_gradient(sp.xyz)
                scaling = jax.lax.stop_gradient(splats_lib.get_scaling(sp))
                val = valid
                if idx is not None:
                    xyz, scaling, val = xyz[idx], scaling[idx], valid[idx]
                planes = None
                if has_encoder and use_planes:
                    frame_id = None
                    if n_frames > 0:
                        frame_id = jnp.round(
                            batch["fid"] * (n_frames - 1)).astype(jnp.int32)
                    planes = net.apply(
                        variables, frame_id,
                        method=type(net).generate_planes)
                attrs = field_attributes(net, variables, xyz, scaling, val,
                                         batch["fid"], n_frames, planes)
            else:
                attrs = static_attributes(sp, valid)

            outs = []
            for v in range(num_views):
                cam = {k: batch[k][v] for k in
                       ("viewmatrix", "projmatrix", "campos",
                        "tanfovx", "tanfovy")}
                outs.append(render_view(
                    attrs, cam, batch["bg"], width, height, sh_degree,
                    pipe_cfg, net=net, variables=variables,
                    screenspace_offset=offsets[v]))
            loss, aux = compute_losses(outs, batch, attrs, opt_cfg,
                                       attrs["valid"])
            aux["bin_dropped"] = sum(o.n_dropped for o in outs)
            last = outs[-1]
            return loss, (aux, last.radii, attrs["means3d"])

        n_render = n_splats if (field_mode and n_splats > 0) else (
            splat_params.capacity)
        offsets = jnp.zeros((num_views, n_render, 2), jnp.float32)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                     has_aux=True)
        fp0 = field_vars["params"] if field_mode else {}
        (loss, (aux, radii, means3d)), (g_sp, g_fp, g_off) = grad_fn(
            splat_params, fp0, offsets)

        # --- optimizer updates ---
        new_sp, new_sp_opt = splat_params, splat_opt
        if enable_gaussian_opt:
            new_sp, new_sp_opt = splats_lib.adam_update(
                splat_params, g_sp, splat_opt, splat_lrs)
        new_fp, new_f_opt = (field_vars.get("params") if field_mode else {}), field_opt
        if field_mode:
            new_fp, new_f_opt = splats_lib.adam_update(
                field_vars["params"], g_fp, field_opt, field_lr)

        # --- densification stats (last view, reference train.py:280-307) ---
        new_stats = splats_lib.update_max_radii(splat_stats, radii, idx=idx)
        new_stats = splats_lib.add_densification_stats(
            new_stats, g_off[-1], radii, idx=idx)

        out = StepOut(loss=loss, l1=aux["l1"], loss_dict=aux, radii=radii,
                      screen_grad=g_off[-1], means3d=means3d)
        return new_sp, new_stats, new_sp_opt, new_fp, new_f_opt, out, rng

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0, 2, 4))


def make_scanned_train_step(net, opt_cfg, pipe_cfg, width, height, num_views,
                            field_mode: bool, n_frames: int, sh_degree: int,
                            k: int, overwrite_loc: bool = False, **kwargs):
    """K train steps per dispatch via ``lax.scan`` (VERDICT r4 item 4).

    The axon relay costs ~ms per dispatch (CLAUDE.md pitfall 4); scanning k
    steps into ONE jitted call amortizes that and lets XLA overlap
    host-independent work across iterations. Intended for the stretches
    between host decision points — the reference only densifies every 100
    iters (train.py:309) and evals every 1000, so k in 4-8 divides cleanly
    (``train.py --scan_k`` picks eligible windows automatically).

    Inputs stacked along a leading k axis: ``batches``, ``splat_lrs``
    (pytree of [k] — the xyz LR changes every iteration), ``field_lrs``
    [k]. ``overwrite_loc=True`` applies the reference's post-step
    field-means -> _xyz copy (train.py:153-155) INSIDE the body, exactly
    as the host loop does between unscanned steps.

    Returns per-step ``(losses, l1s, aux)`` ([k] / [k] / dict of [k])
    instead of the full ``StepOut`` — radii / screen-grad fold into the
    carried stats; materializing them k-fold would cost k*N HBM for
    diagnostics nothing reads between host boundaries."""
    body_step = make_train_step(
        net, opt_cfg, pipe_cfg, width, height, num_views, field_mode,
        n_frames, sh_degree, jit=False, **kwargs)

    def scanned(splat_params, splat_stats, splat_opt, field_vars, field_opt,
                batches, splat_lrs, field_lrs, rng):
        static = {key: v for key, v in field_vars.items() if key != "params"}

        def body(carry, xs):
            sp, st, so, fp, fo, key = carry
            b, lrs, flr = xs
            sp, st, so, fp, fo, out, key = body_step(
                sp, st, so, dict(static, params=fp), fo, b, lrs, flr, key)
            if overwrite_loc and out.means3d.shape[0] == sp.xyz.shape[0]:
                import dataclasses as dc
                sp = dc.replace(sp, xyz=out.means3d)
            return (sp, st, so, fp, fo, key), (out.loss, out.l1,
                                               dict(out.loss_dict))

        carry0 = (splat_params, splat_stats, splat_opt,
                  field_vars.get("params", {}), field_opt, rng)
        (sp, st, so, fp, fo, rng), (losses, l1s, aux) = jax.lax.scan(
            body, carry0, (batches, splat_lrs, field_lrs), length=k)
        return sp, st, so, fp, fo, losses, l1s, aux, rng

    return jax.jit(scanned, donate_argnums=(0, 2, 4))
