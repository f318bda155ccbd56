"""Inference-side rendering helpers shared by eval, render CLI and bench."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.ops.raster.api import rasterize


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "field_mode",
                     "n_frames", "tile_size", "tile_cap", "k_chunk",
                     "dup_factor", "net"))
def _render_jit(params, valid, field_vars, viewmatrix, projmatrix, campos,
                tanfovx, tanfovy, bg, fid, *, net, width, height, sh_degree,
                field_mode, n_frames, tile_size, tile_cap, k_chunk,
                dup_factor):
    if field_mode:
        xyz = params.xyz
        scaling = splats_lib.get_scaling(params)
        attrs = train_lib.field_attributes(
            net, field_vars, xyz, scaling, valid, fid, n_frames)
    else:
        attrs = train_lib.static_attributes(params, valid)

    colors = attrs.get("rgb")
    shs = attrs.get("shs")
    if colors is None and "rgb_feat" in attrs:
        dirs = attrs["means3d"] - campos[None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        colors = net.apply(field_vars, attrs["rgb_feat"], dirs,
                           method=type(net).rgb_from_viewdir)
    out = rasterize(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacity"], viewmatrix, projmatrix, campos, bg,
        tanfovx, tanfovy, width, height,
        colors_precomp=colors, shs=shs, sh_degree=sh_degree,
        valid_mask=attrs["valid"], tile_size=tile_size, tile_cap=tile_cap,
        k_chunk=k_chunk,
        # same instance budget as training (train_lib.py:111): a model
        # trained with an auto-grown dup_factor must not be evaluated
        # under the smaller 8*N default (advisor r2 finding 3)
        dup_cap=dup_factor * attrs["means3d"].shape[0])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "field_mode",
                     "n_frames", "tile_size", "tile_cap", "k_chunk",
                     "dup_factor", "net"))
def _render_scan_jit(params, valid, field_vars, viewmatrices, projmatrices,
                     camposs, tanfovxs, tanfovys, bg, fids, *, net, width,
                     height, sh_degree, field_mode, n_frames, tile_size,
                     tile_cap, k_chunk, dup_factor):
    """K frames per device dispatch via ``lax.scan`` — the serving-side
    twin of train_lib.make_scanned_train_step: each relay dispatch costs
    ~ms (CLAUDE.md pitfall 4), so offline rendering of a camera path pays
    it once per K frames instead of per frame. Sequential (scan, not
    vmap) so peak memory stays that of ONE frame's rasterization.
    Leading axis of the camera operands is K; returns stacked
    (color [K,3,H,W], depth [K,1,H,W], alpha [K,1,H,W], n_dropped [K])."""
    def body(_, cam):
        vm, pm, cp, tx, ty, fid = cam
        out = _render_jit(
            params, valid, field_vars, vm, pm, cp, tx, ty, bg, fid,
            net=net, width=width, height=height, sh_degree=sh_degree,
            field_mode=field_mode, n_frames=n_frames, tile_size=tile_size,
            tile_cap=tile_cap, k_chunk=k_chunk, dup_factor=dup_factor)
        return None, (out.color, out.depth, out.alpha, out.n_dropped)

    _, outs = jax.lax.scan(
        body, None,
        (viewmatrices, projmatrices, camposs, tanfovxs, tanfovys, fids))
    return outs


def render_cameras_batched(cams, params, stats, deform, pipe_cfg, bg,
                           field_mode=True, n_frames=0, sh_degree=0,
                           batch=8):
    """Render a list of host cameras, ``batch`` frames per device
    dispatch. All cameras in ``cams`` must share (width, height) — the
    caller groups by resolution (render.py does). The tail chunk is
    padded by repeating the last camera and sliced off. Yields per-frame
    dicts exactly like ``render_camera``."""
    import numpy as np
    net = deform.net if (deform is not None and field_mode) else None
    field_vars = deform.variables if net is not None else {"params": {}}
    k = max(1, batch)
    for i0 in range(0, len(cams), k):
        chunk = list(cams[i0:i0 + k])
        n_real = len(chunk)
        while len(chunk) < k:
            chunk.append(chunk[-1])
        stack = lambda f: jnp.stack([jnp.asarray(f(c)) for c in chunk])
        colors, depths, alphas, dropped = _render_scan_jit(
            params, stats.valid, field_vars,
            stack(lambda c: c.world_view_transform),
            stack(lambda c: c.full_proj_transform),
            stack(lambda c: c.camera_center),
            stack(lambda c: np.float32(c.tanfovx)),
            stack(lambda c: np.float32(c.tanfovy)),
            jnp.asarray(bg),
            stack(lambda c: np.float32(c.fid)),
            net=net, width=chunk[0].image_width,
            height=chunk[0].image_height, sh_degree=sh_degree,
            field_mode=net is not None, n_frames=n_frames,
            tile_size=pipe_cfg.tile_size, tile_cap=pipe_cfg.tile_cap,
            k_chunk=pipe_cfg.k_chunk,
            dup_factor=getattr(pipe_cfg, "dup_factor", 8))
        colors = np.asarray(colors)
        depths = np.asarray(depths)
        alphas = np.asarray(alphas)
        dropped = np.asarray(dropped)
        for j in range(n_real):
            yield {"render": colors[j], "depth": depths[j],
                   "opacity": alphas[j], "n_dropped": dropped[j]}


def render_camera(cam, params, stats, deform, pipe_cfg, bg,
                  field_mode=True, n_frames=0, sh_degree=0):
    """Render one host camera; returns dict of numpy-backed arrays
    (render [3,H,W], depth [1,H,W], opacity [1,H,W], radii)."""
    net = deform.net if (deform is not None and field_mode) else None
    field_vars = deform.variables if net is not None else {"params": {}}
    out = _render_jit(
        params, stats.valid, field_vars,
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        jnp.asarray(cam.tanfovx, jnp.float32),
        jnp.asarray(cam.tanfovy, jnp.float32),
        jnp.asarray(bg),
        jnp.asarray(cam.fid, jnp.float32),
        net=net, width=cam.image_width, height=cam.image_height,
        sh_degree=sh_degree, field_mode=net is not None, n_frames=n_frames,
        tile_size=pipe_cfg.tile_size, tile_cap=pipe_cfg.tile_cap,
        k_chunk=pipe_cfg.k_chunk,
        dup_factor=getattr(pipe_cfg, "dup_factor", 8))
    # n_dropped > 0 means the render visibly lost instances (eval has no
    # auto-grow like training does — advisor r2 finding 2); callers warn.
    return {"render": out.color, "depth": out.depth, "opacity": out.alpha,
            "radii": out.radii, "n_dropped": out.n_dropped}
