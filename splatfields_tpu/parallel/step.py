"""Sharded training step: shard_map over a ('data', 'model') mesh.

The SPMD layout (new layer — the reference is single-GPU, SURVEY 2.20):

- splat arrays are sharded over ``model`` along the capacity axis: each
  device runs the field MLPs / triplane sampling on its local splat chunk
  (the N-proportional compute), then ``all_gather``s the predicted
  attributes so every device holds the full (small) attribute set — the
  gather-per-tile pattern. The all_gather's VJP is a reduce_scatter, so the
  backward stays sharded too.
- the rasterizer preprocess + binning run replicated (cheap, O(N) elementwise
  + one sort), and the tile grid is sliced over ``model``: each device
  blends ``T/n_model`` tiles — the dominant pixel-time work — and the tile
  buffers are all-gathered to assemble the image for the loss.
- the view batch is sharded over ``data``; parameter gradients are
  ``psum``-ed over both axes.

Field parameters and the CNN plane decode are replicated (N-independent,
SURVEY hard-part 5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.ops.raster.api import default_blend_impl
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import (
    blend_tiles,
    pack_attributes,
    tiles_to_image,
)
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.ops.ssim import ssim as ssim_fn


def _cdiv(a, b):
    return -(-a // b)


def sharded_render_loss(attrs_local, batch_local, opt_cfg, pipe_cfg,
                        width, height, n_model, num_views_local):
    """Render local views from model-sharded attributes; returns loss."""
    # gather full attribute set (VJP: reduce_scatter over 'model')
    attrs = {
        k: jax.lax.all_gather(v, "model", tiled=True)
        for k, v in attrs_local.items()
    }

    tile_size = pipe_cfg.tile_size
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y
    tiles_pad = _cdiv(num_tiles, n_model) * n_model
    t_loc = tiles_pad // n_model
    my_model = jax.lax.axis_index("model")

    losses = []
    for v in range(num_views_local):
        pre = preprocess(
            attrs["means3d"], attrs["scales"], attrs["rotations"],
            attrs["opacity"],
            batch_local["viewmatrix"][v], batch_local["projmatrix"][v],
            width, height,
            batch_local["tanfovx"][v], batch_local["tanfovy"][v],
            colors_precomp=attrs.get("rgb"),
            shs=attrs.get("shs"), sh_degree=0,
            campos=batch_local["campos"][v],
            valid_mask=attrs["valid"],
        )
        impl = default_blend_impl()
        binning = bin_gaussians(
            jax.lax.stop_gradient(pre.means2d),
            jax.lax.stop_gradient(pre.depths),
            pre.radii, tiles_x, tiles_y, tile_size,
            tile_cap=pipe_cfg.tile_cap,
            build_table=(impl != "pallas"))
        # local slice of the tile grid: ranges + counts for t_loc tiles
        start = my_model * t_loc
        start_c = jnp.minimum(start, num_tiles - 1)
        n_real = jnp.clip(num_tiles - start, 0, t_loc)
        local_starts = jax.lax.dynamic_slice_in_dim(
            binning.tile_start, start_c, t_loc + 1, 0)
        local_counts = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([binning.counts,
                             jnp.zeros(tiles_pad - num_tiles, jnp.int32)]),
            start_c, t_loc, 0)
        local_counts = jnp.where(
            jnp.arange(t_loc) < n_real, local_counts, 0)
        local_ids = start_c + jnp.arange(t_loc, dtype=jnp.int32)
        if impl == "pallas":
            pack = pack_attributes(pre.means2d, pre.conics, pre.rgb,
                                   pre.opacity, pre.depths)
            sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
            color_t, _depth_t, tfinal_t = blend_sorted_pallas(
                sorted_pack, local_starts, local_counts,
                tiles_x, tiles_y, tile_size, pipe_cfg.tile_cap,
                pipe_cfg.k_chunk, False)
            local_color = jnp.transpose(color_t, (0, 2, 1))
            local_t = tfinal_t
        else:
            blend = blend_tiles(
                binning.sorted_id, local_starts, local_counts,
                pre.means2d, pre.conics, pre.rgb, pre.opacity,
                pre.depths, tiles_x, tiles_y, tile_size,
                tile_cap=pipe_cfg.tile_cap,
                k_chunk=pipe_cfg.k_chunk, tile_ids=local_ids)
            local_color, local_t = blend.color, blend.final_t
        # gather tile buffers -> full image (VJP scatters back)
        color_tiles = jax.lax.all_gather(
            local_color, "model", tiled=True)[:num_tiles]
        t_tiles = jax.lax.all_gather(
            local_t, "model", tiled=True)[:num_tiles]
        color = tiles_to_image(color_tiles, tiles_x, tiles_y, tile_size,
                               height, width)
        final_t = tiles_to_image(t_tiles, tiles_x, tiles_y, tile_size,
                                 height, width)
        color = color + final_t[..., None] * batch_local["bg"][None, None, :]
        img = jnp.transpose(color, (2, 0, 1))

        gt = batch_local["image"][v]
        l1 = jnp.mean(jnp.abs(img - gt))
        loss = (1 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (
            1 - ssim_fn(img, gt))
        if opt_cfg.lambda_mask > 0.0:
            alpha = jnp.clip(1.0 - final_t, 0.0, 1.0)
            loss = loss + opt_cfg.lambda_mask * jnp.mean(
                jnp.abs(alpha.reshape(-1) - batch_local["mask"][v].reshape(-1)))
        losses.append(loss)
    return sum(losses) / len(losses)


def make_sharded_train_step(net, opt_cfg, pipe_cfg, width, height,
                            views_per_shard: int, field_mode: bool,
                            n_frames: int, mesh: Mesh):
    """Build the pjit-compatible sharded step.

    Input layout contract:
    - splat params / stats: sharded P('model') on the capacity axis,
    - field variables + opt states: replicated,
    - batch: view axis sharded P('data').
    """
    n_model = mesh.shape["model"]

    def local_step(splat_params, valid, field_vars, batch_local, field_lr,
                   field_opt):
        def loss_fn(fp):
            variables = dict(field_vars, params=fp)
            if field_mode:
                xyz = jax.lax.stop_gradient(splat_params.xyz)
                scaling = jax.lax.stop_gradient(
                    splats_lib.get_scaling(splat_params))
                attrs = train_lib.field_attributes(
                    net, variables, xyz, scaling, valid,
                    batch_local["fid"][0], n_frames)
            else:
                attrs = train_lib.static_attributes(splat_params, valid)
                attrs.pop("shs", None)
                attrs["rgb"] = splats_lib.get_features(splat_params)[:, 0] \
                    * 0.28209479177387814 + 0.5
            loss = sharded_render_loss(
                attrs, batch_local, opt_cfg, pipe_cfg, width, height,
                n_model, views_per_shard)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(field_vars["params"])
        # average over data shards; sum over model shards (each holds the
        # gradient contribution of its splat chunk / tile slice)
        grads = jax.lax.psum(grads, "model")
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "model"), "data")
        new_fp, new_opt = splats_lib.adam_update(
            field_vars["params"], grads, field_opt, field_lr)
        return loss, new_fp, new_opt

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("model"), _splat_spec_tree()),
            P("model"),
            P(),              # field vars replicated
            {
                "viewmatrix": P("data"), "projmatrix": P("data"),
                "campos": P("data"), "tanfovx": P("data"),
                "tanfovy": P("data"), "fid": P("data"),
                "image": P("data"), "mask": P("data"), "bg": P(),
            },
            P(),
            P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def _splat_spec_tree():
    """A SplatParams-shaped tree of placeholders for spec mapping."""
    return splats_lib.SplatParams(
        xyz=0, features_dc=0, features_rest=0, scaling=0, rotation=0,
        opacity=0)


def shard_splats(params, stats, mesh):
    """Place splat arrays sharded over 'model' along capacity."""
    spec = NamedSharding(mesh, P("model"))
    put = lambda a: jax.device_put(a, spec)
    params = jax.tree.map(put, params)
    valid = put(stats.valid)
    return params, valid


def replicate(tree, mesh):
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, spec), tree)
