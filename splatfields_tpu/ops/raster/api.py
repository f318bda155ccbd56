"""Differentiable Gaussian-splat rendering: the TPU-native public API.

Replaces the reference's CUDA rasterizer wrapper
(``gaussian_renderer/__init__.py:30-124``). One call produces the color
image, the alpha-blended depth map (the depth fork's third output), the
accumulated-opacity image, screen radii and the visibility filter.

Improvement over the reference: the opacity/"mask" image is the blend's own
final transmittance (alpha = 1 - T), so the second full rasterization the
reference performs for the mask loss (``gaussian_renderer/__init__.py:
76-115``) is not needed — same outputs, half the work. (The reference's
mask pass rasterizes ``colors_precomp=ones`` on black background and takes
channel 0, which is exactly the accumulation image.)

Gradients: everything from preprocess through blending is one autodiff
graph. For the densification statistics the caller passes
``screenspace_offset`` (a zeros [N, 2] array added to the NDC-scaled pixel
means); its gradient equals the CUDA ``means2D`` dummy-tensor gradient that
``add_densification_stats`` consumes (reference ``train.py:307``,
``scene/gaussian_model.py:427-438``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import (
    blend_tiles,
    pack_attributes,
    tiles_to_image,
)
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess


def default_blend_impl() -> str:
    """'pallas' on real TPU backends, 'jax' elsewhere (CPU tests run the
    Pallas kernel through its interpreter only in dedicated parity tests)."""
    import jax as _jax
    return "jax" if _jax.default_backend() == "cpu" else "pallas"


class RenderOut(NamedTuple):
    color: jnp.ndarray    # [3, H, W]
    depth: jnp.ndarray    # [1, H, W] alpha-weighted view depth (unnormalized)
    alpha: jnp.ndarray    # [1, H, W] accumulated opacity (mask image)
    radii: jnp.ndarray    # [N] int32 screen radii (0 = invisible)
    n_dropped: jnp.ndarray  # scalar: instances beyond the dup_cap budget


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_width", "image_height", "sh_degree", "tile_size", "tile_cap",
        "k_chunk", "dup_cap", "blend_impl",
    ),
)
def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    bg: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    image_width: int,
    image_height: int,
    colors_precomp: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    valid_mask: jnp.ndarray | None = None,
    screenspace_offset: jnp.ndarray | None = None,
    tile_size: int = 16,
    tile_cap: int = 1024,
    k_chunk: int = 128,
    dup_cap: int | None = None,
    blend_impl: str | None = None,
) -> RenderOut:
    """Render one view. All shape arguments static; N is the (padded) splat
    capacity. See module docstring for semantics."""
    pre = preprocess(
        means3d, scales, rotations, opacities,
        viewmatrix, projmatrix, image_width, image_height,
        tanfovx, tanfovy,
        colors_precomp=colors_precomp, shs=shs, sh_degree=sh_degree,
        campos=campos, scale_modifier=scale_modifier, valid_mask=valid_mask,
    )

    means2d = pre.means2d
    if screenspace_offset is not None:
        # CUDA's dL/dmean2D is expressed in half-resolution NDC units
        # (backward.cu converts pixel-space gradients by 0.5*W / 0.5*H).
        # Adding offset * (0.5*W, 0.5*H) in pixel space makes the gradient
        # w.r.t. the zero offset come out in exactly those units.
        scale_vec = jnp.array(
            [0.5 * image_width, 0.5 * image_height], jnp.float32
        )
        means2d = means2d + screenspace_offset * scale_vec[None, :]

    tiles_x = -(-image_width // tile_size)
    tiles_y = -(-image_height // tile_size)

    if blend_impl is None:
        blend_impl = default_blend_impl()
    binning = bin_gaussians(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(pre.depths),
        pre.radii,
        tiles_x, tiles_y, tile_size, tile_cap=tile_cap, dup_cap=dup_cap,
        build_table=(blend_impl != "pallas"),
    )
    if blend_impl == "pallas":
        pack = pack_attributes(means2d, pre.conics, pre.rgb, pre.opacity,
                               pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
        color_t, depth_t, tfinal_t = blend_sorted_pallas(
            sorted_pack, binning.tile_start, binning.counts,
            tiles_x, tiles_y, tile_size, tile_cap, k_chunk, False)
        color_tiles = jnp.transpose(color_t, (0, 2, 1))   # [T, P, 3]
    else:
        blend = blend_tiles(
            binning.sorted_id, binning.tile_start, binning.counts,
            means2d, pre.conics, pre.rgb, pre.opacity, pre.depths,
            tiles_x, tiles_y, tile_size, tile_cap=tile_cap, k_chunk=k_chunk,
        )
        color_tiles, depth_t, tfinal_t = (blend.color, blend.depth,
                                          blend.final_t)

    color = tiles_to_image(color_tiles, tiles_x, tiles_y, tile_size,
                           image_height, image_width)      # [H, W, 3]
    depth = tiles_to_image(depth_t, tiles_x, tiles_y, tile_size,
                           image_height, image_width)      # [H, W]
    final_t = tiles_to_image(tfinal_t, tiles_x, tiles_y, tile_size,
                             image_height, image_width)    # [H, W]

    color = color + final_t[..., None] * bg[None, None, :]
    return RenderOut(
        color=jnp.transpose(color, (2, 0, 1)),
        depth=depth[None],
        alpha=(1.0 - final_t)[None],
        radii=pre.radii,
        n_dropped=binning.n_dropped,
    )
