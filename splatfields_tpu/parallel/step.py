"""Sharded FULL training step: shard_map over a ('data', 'model') mesh.

A 1:1 sharded replacement for ``train_lib.make_train_step`` (reference
contract ``train.py:140-322``): splat-param gradients + splat Adam,
field-param gradients + field Adam, densification statistics, and every
lambda loss term — not just the field-parameter photometric demo of round 1.

SPMD layout (new layer — the reference is single-GPU, SURVEY 2.20):

- splat params / stats / splat Adam state are sharded over ``model`` along
  the capacity axis: each device runs the field MLPs (or the static
  activations) on its local splat chunk — the N-proportional compute — then
  ``all_gather``s the predicted attributes so every device holds the full
  attribute set (gather-per-tile). The all_gather's transpose is a
  psum_scatter, so splat/field gradients come back exactly sharded.
- rasterizer preprocess + binning run replicated (cheap O(N) elementwise +
  one sort); the tile grid is sliced over ``model``: each device blends
  ``T/n_model`` tiles — the dominant pixel-time work — and tile buffers are
  all-gathered to assemble the full image for the loss.
- the view batch is sharded over ``data``; parameter gradients are
  psum('model') / pmean('data')-reduced as appropriate.

Gradient correctness: each model shard computes the FULL loss from the
gathered image and regularizers, divided by ``n_model``. With cotangent 1
seeded on every shard, every cross-shard path is summed by a collective
transpose (all_gather <-> psum_scatter), so

- local-chunk param grads (splat params, field-net chunk path) come out
  exact with NO extra collective,
- replicated-param grads (field params via the view-dep head, screenspace
  offsets) need one psum over 'model',
- everything needs a pmean over 'data' (views differ per data shard).

Documented deviations from the single-device step (PARITY.md):
- ``n_splats`` subsampling is not supported sharded (pass -1),
- densification stats average each data shard's LAST local view (the
  reference uses the single last view of its Python loop,
  ``train.py:280-307``); max_radii2D takes the pmax over data shards.

Field parameters and the CNN plane decode are replicated (N-independent,
SURVEY hard-part 5).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.ops.raster.api import RenderOut, default_blend_impl
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import (
    blend_tiles,
    pack_attributes,
    tiles_to_image,
)
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess


def _cdiv(a, b):
    return -(-a // b)


def _sharded_render_view(attrs, cam, bg, width, height, sh_degree, pipe,
                         n_model, net=None, variables=None,
                         screenspace_offset=None):
    """One view, tile grid sliced over 'model'. Mirrors ``api.rasterize``
    (same preprocess/binning/blend semantics) with the blend restricted to
    this shard's slice of the global tile grid."""
    colors = attrs.get("rgb")
    shs = attrs.get("shs")
    if colors is None and "rgb_feat" in attrs:
        dirs = attrs["means3d"] - cam["campos"][None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        colors = net.apply(variables, attrs["rgb_feat"], dirs,
                           method=type(net).rgb_from_viewdir)

    pre = preprocess(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacity"],
        cam["viewmatrix"], cam["projmatrix"], width, height,
        cam["tanfovx"], cam["tanfovy"],
        colors_precomp=colors, shs=shs, sh_degree=sh_degree,
        campos=cam["campos"], valid_mask=attrs["valid"],
    )
    means2d = pre.means2d
    if screenspace_offset is not None:
        scale_vec = jnp.array([0.5 * width, 0.5 * height], jnp.float32)
        means2d = means2d + screenspace_offset * scale_vec[None, :]

    tile_size = pipe.tile_size
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y
    tiles_pad = _cdiv(num_tiles, n_model) * n_model
    t_loc = tiles_pad // n_model
    my_model = jax.lax.axis_index("model")

    impl = default_blend_impl()
    binning = bin_gaussians(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(pre.depths),
        pre.radii, tiles_x, tiles_y, tile_size,
        tile_cap=pipe.tile_cap,
        dup_cap=getattr(pipe, "dup_factor", 8) * means2d.shape[0],
        build_table=(impl != "pallas"))

    # Local slice of the tile grid. tile_start has num_tiles+1 entries; pad
    # BOTH arrays to the padded grid (starts repeat the terminal value,
    # counts are zero) so no slice start is ever clamped and starts stay
    # aligned with counts on the last shard (tiles_pad % n_model == 0 by
    # construction, but num_tiles % n_model generally != 0).
    start = my_model * t_loc
    starts_pad = jnp.concatenate([
        binning.tile_start,
        jnp.broadcast_to(binning.tile_start[-1:], (tiles_pad - num_tiles,)),
    ])
    counts_pad = jnp.concatenate([
        binning.counts,
        jnp.zeros(tiles_pad - num_tiles, jnp.int32),
    ])
    local_starts = jax.lax.dynamic_slice_in_dim(starts_pad, start,
                                                t_loc + 1, 0)
    local_counts = jax.lax.dynamic_slice_in_dim(counts_pad, start, t_loc, 0)
    # global tile ids for pixel coordinates (clipped ids only ever pair with
    # zero counts, so the blend result there is discarded anyway)
    local_ids = jnp.minimum(start + jnp.arange(t_loc, dtype=jnp.int32),
                            num_tiles - 1)

    if impl == "pallas":
        pack = pack_attributes(means2d, pre.conics, pre.rgb,
                               pre.opacity, pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
        color_t, depth_t, tfinal_t = blend_sorted_pallas(
            sorted_pack, local_starts, local_counts,
            tiles_x, tiles_y, tile_size, pipe.tile_cap,
            pipe.k_chunk, False, tile_ids=local_ids)
        local_color = jnp.transpose(color_t, (0, 2, 1))   # [t_loc, P, 3]
        local_depth, local_t = depth_t, tfinal_t
    else:
        blend = blend_tiles(
            binning.sorted_id, local_starts, local_counts,
            means2d, pre.conics, pre.rgb, pre.opacity,
            pre.depths, tiles_x, tiles_y, tile_size,
            tile_cap=pipe.tile_cap,
            k_chunk=pipe.k_chunk, tile_ids=local_ids)
        local_color, local_depth, local_t = (blend.color, blend.depth,
                                             blend.final_t)

    # gather tile buffers -> full image (transpose scatters grads back)
    color_tiles = jax.lax.all_gather(
        local_color, "model", tiled=True)[:num_tiles]
    depth_tiles = jax.lax.all_gather(
        local_depth, "model", tiled=True)[:num_tiles]
    t_tiles = jax.lax.all_gather(
        local_t, "model", tiled=True)[:num_tiles]
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
        radii=pre.radii,
        n_dropped=binning.n_dropped,
    )


def make_sharded_train_step(net, opt_cfg, pipe_cfg, width, height,
                            views_per_shard: int, field_mode: bool,
                            n_frames: int, mesh: Mesh, sh_degree: int = 0,
                            enable_gaussian_opt: bool = True,
                            use_planes: bool = True,
                            ring: bool = False,
                            batch_keys: tuple = (
                                "viewmatrix", "projmatrix", "campos",
                                "tanfovx", "tanfovy", "fid", "image",
                                "mask", "depth", "bg")):
    """Build the jitted sharded step (1:1 with ``train_lib.make_train_step``
    minus the ``n_splats`` subsample path).

    Input layout contract:
    - splat params / stats / splat Adam moments: P('model') on capacity
      (capacity must divide by the model axis),
    - field variables + field opt state + LRs: replicated,
    - batch: view axis sharded P('data'); ``bg``/``fid`` replicated.

    Returns ``(new_sp, new_stats, new_sp_opt, new_fp, new_f_opt, out)``
    with ``out`` a ``train_lib.StepOut`` (radii/screen_grad are the LOCAL
    capacity chunk; means3d is the local chunk of field-predicted means).
    """
    n_model = mesh.shape["model"]

    has_encoder = (field_mode and net is not None and net.encoder_type in
                   ("VarTriPlaneEncoder", "VarHexPlaneEncoder"))

    def local_step(splat_params, splat_stats, splat_opt, field_vars,
                   field_opt, batch, splat_lrs, field_lr):
        valid_local = splat_stats.valid
        c_loc = splat_params.xyz.shape[0]
        my_model = jax.lax.axis_index("model")

        def loss_fn(sp, fp, offsets):
            variables = None
            if field_mode:
                variables = dict(field_vars, params=fp)
                xyz = jax.lax.stop_gradient(sp.xyz)
                scaling = jax.lax.stop_gradient(splats_lib.get_scaling(sp))
                planes = None
                if has_encoder and use_planes:
                    frame_id = None
                    if n_frames > 0:
                        frame_id = jnp.round(
                            batch["fid"] * (n_frames - 1)).astype(jnp.int32)
                    planes = net.apply(
                        variables, frame_id,
                        method=type(net).generate_planes)
                attrs_local = train_lib.field_attributes(
                    net, variables, xyz, scaling, valid_local,
                    batch["fid"], n_frames, planes)
            else:
                attrs_local = train_lib.static_attributes(sp, valid_local)

            gather = lambda v: jax.lax.all_gather(v, "model", tiled=True)
            cams = [{k: batch[k][v] for k in
                     ("viewmatrix", "projmatrix", "campos",
                      "tanfovx", "tanfovy")} for v in range(views_per_shard)]
            if ring:
                # blocks travel the ring; gather ONLY what active global
                # regularizers read (parallel/ring.py docstring)
                from splatfields_tpu.parallel.ring import ring_render_view
                outs = [ring_render_view(
                    attrs_local, cams[v], batch["bg"], width, height,
                    sh_degree, pipe_cfg, n_model, net=net,
                    variables=variables, screenspace_offset=offsets[v])
                    for v in range(views_per_shard)]
                need_means = (opt_cfg.lambda_norm > 0
                              or opt_cfg.lambda_norm_mean > 0
                              or opt_cfg.lambda_corr > 0
                              or opt_cfg.lambda_corr_color > 0)
                need_full = (opt_cfg.lambda_corr > 0
                             or opt_cfg.lambda_corr_color > 0)
                attrs = {}
                if need_means:
                    attrs["means3d"] = gather(attrs_local["means3d"])
                if need_full:
                    for k in ("scales", "rotations", "opacity", "rgb",
                              "shs", "rgb_feat"):
                        if k in attrs_local:
                            attrs[k] = gather(attrs_local[k])
                reg_valid = (gather(valid_local) if need_means
                             else valid_local)
                means3d_out = attrs_local["means3d"]
            else:
                # full attribute set on every device (transpose:
                # psum_scatter)
                attrs = {k: gather(v) for k, v in attrs_local.items()}
                outs = [_sharded_render_view(
                    attrs, cams[v], batch["bg"], width, height, sh_degree,
                    pipe_cfg, n_model, net=net, variables=variables,
                    screenspace_offset=offsets[v])
                    for v in range(views_per_shard)]
                reg_valid = attrs["valid"]
                means3d_out = attrs["means3d"]
            loss, aux = train_lib.compute_losses(outs, batch, attrs,
                                                 opt_cfg, reg_valid)
            aux["bin_dropped"] = jnp.asarray(
                sum(o.n_dropped for o in outs), jnp.float32)
            last = outs[-1]
            # every model shard computed the identical full loss; divide so
            # the summed cotangents reconstruct exactly one copy
            return loss / n_model, (aux, last.radii, means3d_out)

        c_off = c_loc if ring else c_loc * n_model
        offsets = jnp.zeros((views_per_shard, c_off, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                     has_aux=True)
        fp0 = field_vars["params"] if field_mode else {}
        (loss_div, (aux, radii_full, means3d_full)), (g_sp, g_fp, g_off) = \
            grad_fn(splat_params, fp0, offsets)

        loss = jax.lax.pmean(jax.lax.psum(loss_div, "model"), "data")
        aux = jax.tree.map(lambda a: jax.lax.pmean(a, "data"), aux)

        # gradient reductions (see module docstring)
        g_sp = jax.lax.pmean(g_sp, "data")
        g_fp = jax.lax.psum(g_fp, "model")
        g_fp = jax.lax.pmean(g_fp, "data")
        if not ring:
            # ring mode: ppermute's transpose already returned each
            # offset gradient to its owning device
            g_off = jax.lax.psum(g_off, "model")

        new_sp, new_sp_opt = splat_params, splat_opt
        if enable_gaussian_opt:
            new_sp, new_sp_opt = splats_lib.adam_update(
                splat_params, g_sp, splat_opt, splat_lrs)
        new_fp = field_vars.get("params") if field_mode else {}
        new_f_opt = field_opt
        if field_mode:
            new_fp, new_f_opt = splats_lib.adam_update(
                field_vars["params"], g_fp, field_opt, field_lr)

        # densification stats on the LOCAL capacity chunk: last local view,
        # averaged over data shards (documented deviation); radii take the
        # pmax over data shards' last views
        if ring:
            radii_local = radii_full          # already the local chunk
            g_off_local = g_off[-1]
        else:
            radii_local = jax.lax.dynamic_slice_in_dim(
                radii_full, my_model * c_loc, c_loc, 0)
            g_off_local = jax.lax.dynamic_slice_in_dim(
                g_off[-1], my_model * c_loc, c_loc, 0)
        radii_max = jax.lax.pmax(radii_local, "data")
        new_stats = splats_lib.update_max_radii(splat_stats, radii_max)
        norm = jnp.linalg.norm(g_off_local, axis=-1)
        vis = radii_local > 0
        add_accum = jax.lax.pmean(jnp.where(vis, norm, 0.0), "data")
        add_denom = jax.lax.pmean(vis.astype(jnp.float32), "data")
        new_stats = dataclasses.replace(
            new_stats,
            xyz_gradient_accum=new_stats.xyz_gradient_accum + add_accum,
            denom=new_stats.denom + add_denom,
        )

        means3d_local = (means3d_full if ring
                         else jax.lax.dynamic_slice_in_dim(
                             means3d_full, my_model * c_loc, c_loc, 0))
        out = train_lib.StepOut(
            loss=loss, l1=aux["l1"], loss_dict=aux, radii=radii_local,
            screen_grad=g_off_local, means3d=means3d_local)
        return new_sp, new_stats, new_sp_opt, new_fp, new_f_opt, out

    model_adam = splats_lib.AdamState(count=P(), mu=P("model"),
                                      nu=P("model"))
    repl_adam = splats_lib.AdamState(count=P(), mu=P(), nu=P())
    if getattr(opt_cfg, "corr_interval", 1) > 1 and \
            "corr_gate" not in batch_keys:
        batch_keys = batch_keys + ("corr_gate",)
    batch_spec = {k: (P() if k in ("fid", "bg", "corr_gate") else P("data"))
                  for k in batch_keys}
    out_spec = train_lib.StepOut(
        loss=P(), l1=P(), loss_dict=P(), radii=P("model"),
        screen_grad=P("model"), means3d=P("model"))
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(
            P("model"),       # splat params
            P("model"),       # splat stats
            model_adam,       # splat Adam state
            P(),              # field vars (replicated)
            repl_adam,        # field Adam state
            batch_spec,
            P(),              # splat lrs (scalars)
            P(),              # field lr
        ),
        out_specs=(P("model"), P("model"), model_adam, P(), repl_adam,
                   out_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 4))


def make_sharded_densify(mesh, max_screen_size, percent_dense):
    """On-mesh densification (VERDICT r2 item 5): jit the GLOBAL
    ``splats_lib.densify_and_prune`` over the mesh with model-sharded
    in/out shardings. GSPMD inserts the collectives (the cumsum-based
    compaction all_gathers over ICI) and slices the results back onto the
    shards — semantics identical to the host path (same program, same
    rng), but the splat state never round-trips through host memory the
    way ``train.py``'s round-2 unshard -> densify -> re-shard did.

    Ref contract: ``/root/reference/scene/gaussian_model.py:355-425``.
    """
    shard = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())
    adam = splats_lib.AdamState(count=repl, mu=shard, nu=shard)

    def run(params, stats, opt_state, rng, grad_thr, min_op, extent):
        return splats_lib.densify_and_prune(
            params, stats, opt_state, rng, grad_thr, min_op, extent,
            max_screen_size, percent_dense=percent_dense)

    return jax.jit(
        run,
        in_shardings=(shard, shard, adam, repl, repl, repl, repl),
        out_shardings=(shard, shard, adam, repl),
        donate_argnums=(0, 1, 2),
    )


def shard_train_state(params, stats, opt_state, mesh):
    """Place splat params/stats/Adam state sharded over 'model' along the
    capacity axis (capacity must be divisible by the model axis size)."""
    n_model = mesh.shape["model"]
    if params.xyz.shape[0] % n_model:
        raise ValueError(
            f"capacity {params.xyz.shape[0]} not divisible by model axis "
            f"{n_model}")
    spec = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())
    put = lambda a: jax.device_put(a, spec)
    params = jax.tree.map(put, params)
    stats = jax.tree.map(put, stats)
    opt_state = splats_lib.AdamState(
        count=jax.device_put(opt_state.count, repl),
        mu=jax.tree.map(put, opt_state.mu),
        nu=jax.tree.map(put, opt_state.nu),
    )
    return params, stats, opt_state


def replicate(tree, mesh):
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, spec), tree)
