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
