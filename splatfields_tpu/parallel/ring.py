"""Ring exchange of Gaussian blocks against fixed pixel-tile shards.

The default sharded step (parallel/step.py) all_gathers the predicted
attribute set, so every device transiently holds all N splats — fine to a
few hundred k, but the wrong shape when N is too large to replicate
(SURVEY 5.7/5.8: "ring-style exchange of Gaussian batches against fixed
pixel shards ... structurally identical to ring attention"). This module
implements that exchange:

- each device keeps its FIXED slice of the tile grid (the pixel shard) and
  its local 1/n_model block of splat attributes;
- the blocks travel around the 'model' ring via ``jax.lax.ppermute``
  (n_model - 1 hops). At each hop every device preprocesses the resident
  block (O(N/n) EWA projection), expands it into per-tile instances
  restricted to ITS OWN tile slice (the scatter-free duplication of
  ops/raster/binning.py), and appends the survivors' packed render
  attributes to a bounded local instance buffer;
- after the ring, ONE local sort by (tile, depth, global gaussian id)
  restores exactly the global front-to-back order ``bin_gaussians``
  produces (its order is the stable tile-sort of depth-argsorted slots;
  equal depths tie-break by gaussian id in both), and the standard blend
  consumes the buffer directly.

Peak per-device memory is O(N/n_model) attributes + O(ring_keep) packed
instances, instead of O(N) — the memory that matters scales with the
device count. Everything is differentiable: block attributes flow through
ppermute (whose transpose routes gradients back to the owning device), the
compaction and final ordering are applied as gathers of stop-gradient
permutations, and the blend keeps its custom VJP.

Global-regularizer caveat: losses over ALL splats (Moran/KNN) still need a
full gather; parallel/step.py gathers only the fields those active lambda
terms read (see make_sharded_train_step(ring=True)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatfields_tpu.ops.raster.api import RenderOut, default_blend_impl
from splatfields_tpu.ops.raster.binning import duplicate_instances
from splatfields_tpu.ops.raster.blend_jax import (
    blend_tiles,
    pack_attributes,
    tiles_to_image,
)
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess


def _cdiv(a, b):
    return -(-a // b)


def ring_render_view(attrs_local, cam, bg, width, height, sh_degree, pipe,
                     n_model, net=None, variables=None,
                     screenspace_offset=None, axis_name="model"):
    """Render one view with Gaussian blocks ring-exchanged over
    ``axis_name`` and the tile grid statically sliced per device.

    ``attrs_local``: this device's splat chunk (train_lib attribute dict).
    ``screenspace_offset``: optional [c_loc, 2] LOCAL zeros carrier — its
    gradient arrives back on the owning device (no extra collective).
    Returns a RenderOut whose ``radii`` cover the LOCAL chunk.
    """
    tile_size = pipe.tile_size
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y
    tiles_pad = _cdiv(num_tiles, n_model) * n_model
    t_loc = tiles_pad // n_model
    me = jax.lax.axis_index(axis_name)
    t0 = me * t_loc

    c_loc = attrs_local["means3d"].shape[0]
    pre_cap = getattr(pipe, "dup_factor", 8) * c_loc
    # per-block keep budget: a block's instances land ~uniformly over the
    # n_model tile shards; 4x headroom over the uniform share
    keep = getattr(pipe, "ring_keep", None) or min(
        4 * _cdiv(pre_cap, n_model), pre_cap)
    cap = n_model * keep

    perm_fwd = [(i, (i + 1) % n_model) for i in range(n_model)]

    buf_rows = jnp.zeros((cap, 10), jnp.float32)
    buf_tile = jnp.full((cap,), t_loc, jnp.int32)      # local sentinel
    buf_depth = jnp.full((cap,), jnp.inf, jnp.float32)
    buf_gid = jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
    n_dropped = jnp.zeros((), jnp.int32)
    radii_local = None

    block = dict(attrs_local)
    if screenspace_offset is not None:
        block = dict(block, _offset=screenspace_offset)
    block["_owner"] = jnp.full((1,), me, jnp.int32)

    for s in range(n_model):
        colors = block.get("rgb")
        shs = block.get("shs")
        if colors is None and "rgb_feat" in block:
            dirs = block["means3d"] - cam["campos"][None]
            dirs = dirs / (jnp.linalg.norm(dirs, axis=-1,
                                           keepdims=True) + 1e-12)
            colors = net.apply(variables, block["rgb_feat"], dirs,
                               method=type(net).rgb_from_viewdir)
        pre = preprocess(
            block["means3d"], block["scales"], block["rotations"],
            block["opacity"],
            cam["viewmatrix"], cam["projmatrix"], width, height,
            cam["tanfovx"], cam["tanfovy"],
            colors_precomp=colors, shs=shs, sh_degree=sh_degree,
            campos=cam["campos"], valid_mask=block["valid"],
        )
        means2d = pre.means2d
        if "_offset" in block:
            scale_vec = jnp.array([0.5 * width, 0.5 * height], jnp.float32)
            means2d = means2d + block["_offset"] * scale_vec[None, :]
        if s == 0:
            radii_local = pre.radii  # my own block's screen radii

        tile, gid, total, _depth = duplicate_instances(
            jax.lax.stop_gradient(means2d),
            jax.lax.stop_gradient(pre.depths),
            pre.radii, tiles_x, tiles_y, tile_size, pre_cap)
        mine = (tile >= t0) & (tile < t0 + t_loc) & (gid >= 0)
        # compact my instances to the front (stable; slot order preserved)
        ckey = jnp.where(mine, 0, 1).astype(jnp.int32)
        slot = jnp.arange(pre_cap, dtype=jnp.int32)
        _, perm = jax.lax.sort((ckey, slot), num_keys=1, is_stable=True)
        sel = perm[:keep]
        sel_ok = mine[sel]
        sel_gid = jnp.where(sel_ok, gid[sel], 0)

        pack = pack_attributes(means2d, pre.conics, pre.rgb, pre.opacity,
                               pre.depths)
        rows = pack[sel_gid] * sel_ok[:, None].astype(jnp.float32)
        owner = block["_owner"][0]
        e_tile = jnp.where(sel_ok, tile[sel] - t0, t_loc)
        e_depth = jnp.where(sel_ok, rows[:, 9], jnp.inf)  # pack col 9 = depth
        e_gid = jnp.where(sel_ok, owner * c_loc + sel_gid,
                          jnp.iinfo(jnp.int32).max)

        off = s * keep
        buf_rows = jax.lax.dynamic_update_slice(buf_rows, rows, (off, 0))
        buf_tile = jax.lax.dynamic_update_slice(buf_tile, e_tile, (off,))
        buf_depth = jax.lax.dynamic_update_slice(buf_depth, e_depth, (off,))
        buf_gid = jax.lax.dynamic_update_slice(buf_gid, e_gid, (off,))
        n_mine = jnp.sum(mine.astype(jnp.int32))
        n_dropped = (n_dropped + jnp.maximum(total - pre_cap, 0)
                     + jnp.maximum(n_mine - keep, 0))

        if s + 1 < n_model:
            block = jax.lax.ppermute(block, axis_name, perm_fwd)

    # global front-to-back order within my tiles: (tile, depth, global id)
    iota = jnp.arange(cap, dtype=jnp.int32)
    _, _, _, order = jax.lax.sort(
        (buf_tile, jax.lax.stop_gradient(buf_depth), buf_gid, iota),
        num_keys=3, is_stable=True)
    sorted_rows = buf_rows[order]
    sorted_tile = buf_tile[order]
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(t_loc + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]
    local_ids = jnp.minimum(t0 + jnp.arange(t_loc, dtype=jnp.int32),
                            num_tiles - 1)

    impl = default_blend_impl()
    if impl == "pallas":
        color_t, depth_t, tfinal_t = blend_sorted_pallas(
            sorted_rows, tile_start, counts,
            tiles_x, tiles_y, tile_size, pipe.tile_cap,
            pipe.k_chunk, False, tile_ids=local_ids)
        local_color = jnp.transpose(color_t, (0, 2, 1))
        local_depth, local_t = depth_t, tfinal_t
    else:
        blend = blend_tiles(
            jnp.arange(cap, dtype=jnp.int32), tile_start, counts,
            sorted_rows[:, 0:2], sorted_rows[:, 2:5], sorted_rows[:, 6:9],
            sorted_rows[:, 5], sorted_rows[:, 9],
            tiles_x, tiles_y, tile_size, tile_cap=pipe.tile_cap,
            k_chunk=pipe.k_chunk, tile_ids=local_ids)
        local_color, local_depth, local_t = (blend.color, blend.depth,
                                             blend.final_t)

    color_tiles = jax.lax.all_gather(
        local_color, axis_name, tiled=True)[:num_tiles]
    depth_tiles = jax.lax.all_gather(
        local_depth, axis_name, tiled=True)[:num_tiles]
    t_tiles = jax.lax.all_gather(
        local_t, axis_name, tiled=True)[:num_tiles]
    color = tiles_to_image(color_tiles, tiles_x, tiles_y, tile_size,
                           height, width)
    depth = tiles_to_image(depth_tiles, tiles_x, tiles_y, tile_size,
                           height, width)
    final_t = tiles_to_image(t_tiles, tiles_x, tiles_y, tile_size,
                             height, width)
    color = color + final_t[..., None] * bg[None, None, :]
    return RenderOut(
        color=jnp.transpose(color, (2, 0, 1)),
        depth=depth[None],
        alpha=(1.0 - final_t)[None],
        radii=radii_local,
        n_dropped=n_dropped,
    )
