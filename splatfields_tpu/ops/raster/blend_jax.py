"""Front-to-back tile alpha blending (pure JAX, differentiable).

Vectorized re-derivation of the CUDA per-tile blend loop (upstream
``renderCUDA`` of ingra14m/depth-diff-gaussian-rasterization; contract at
reference ``gaussian_renderer/__init__.py:94-102``): per pixel,
front-to-back compositing

    C = sum_i c_i * alpha_i * T_i,   T_i = prod_{j<i} (1 - alpha_j)

with the CUDA skip rules reproduced exactly:
- ``power > 0``            -> Gaussian skipped for that pixel,
- ``alpha < 1/255``        -> skipped,
- ``T_i * (1-alpha_i) < 1e-4`` -> pixel done; the triggering Gaussian is
  NOT applied and nothing after it is.

TPU data-movement design (the part that matters): a TPU gather fetches a
whole (8, 128) tile per index, so per-attribute scalar gathers are ~1000x
off speed-of-light. Instead:

1. all per-splat render attributes are packed into ONE [N, 8+3] row matrix,
2. one row gather reorders it into the depth-sorted duplicated instance
   order produced by binning (``sorted_id``): [dup_cap, A],
3. each tile's slice of that array is CONTIGUOUS (``tile_start`` ranges), so
   the dense [T, tile_cap, A] table is built with block dynamic-slices
   (sequential reads, no per-element gathers),
4. the compositing scan slices K-sized chunks from the dense table — zero
   gathers inside the loop.

Instead of a sequential per-splat loop, the compositing weights are computed
in K-sized chunks with an (exclusive) cumulative product along the splat
axis — the weighted color sums then become [K, P] x [K, C] matmuls on the
MXU. The early-done semantics are recovered in closed form from the full
cumulative product (see ``_blend_chunk``), which is exact: the
transmittance sequence only diverges *after* the first trigger, where all
contributions are masked anyway.

The depth channel accumulates alpha-weighted view depth without final
normalization, matching the depth fork's forward.

Differentiable by JAX autodiff; the chunk scan body is rematerialized
(``jax.checkpoint``) so the backward recomputes alphas from the (cheap)
dense table instead of storing [cap, pixels] intermediates.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4

# packed attribute layout
_A = 10  # mean_x, mean_y, con_a, con_b, con_c, opacity, r, g, b, depth


class TileBlendOut(NamedTuple):
    color: jnp.ndarray    # [T, P, 3]
    depth: jnp.ndarray    # [T, P]
    final_t: jnp.ndarray  # [T, P]


def _blend_chunk(carry, chunk):
    """One K-chunk of front-to-back compositing for all tiles.

    carry: (color [T, P, 3], depth [T, P], t_true [T, P], t_full [T, P])
    chunk: (tab [A, T, K] packed attrs, valid [T, K], px [T, P], py [T, P])

    Early-termination semantics in closed form: let s_i be the *inclusive*
    cumulative transmittance including every alpha seen so far (monotone
    decreasing). CUDA applies splat i iff no j <= i had
    T_j * (1-alpha_j) < 1e-4 with alpha_j > 0; because s is monotone and
    splats with alpha = 0 contribute nothing, this is exactly
    ``w_i = alpha_i * T_i * [s_i >= 1e-4]``. The pixel's true (frozen)
    transmittance is the smallest s_i still >= 1e-4. Two carries:
    ``t_full`` (unfrozen inclusive product — the mask/cumprod seed, keeps
    decreasing past the stop) and ``t_true`` (the CUDA-visible T). This
    costs ONE cumulative op per chunk instead of cumprod+cumsum+prod.
    """
    color, depth, t_true, t_full = carry
    tab, valid, px, py = chunk
    mx, my = tab[0], tab[1]
    ca, cb, cc = tab[2], tab[3], tab[4]
    op, z = tab[5], tab[9]
    rgb = jnp.stack([tab[6], tab[7], tab[8]], axis=-1)  # [T, K, 3]

    dx = mx[:, :, None] - px[:, None, :]              # [T, K, P]
    dy = my[:, :, None] - py[:, None, :]
    power = (
        -0.5 * (ca[:, :, None] * dx * dx + cc[:, :, None] * dy * dy)
        - cb[:, :, None] * dx * dy
    )
    alpha = jnp.minimum(0.99, op[:, :, None] * jnp.exp(power))
    skip = (power > 0.0) | (alpha < _ALPHA_MIN) | (~valid[:, :, None])
    alpha = jnp.where(skip, 0.0, alpha)

    # inclusive cumulative transmittance s_i seeded by the full carry
    s = t_full[:, None, :] * jnp.cumprod(1.0 - alpha, axis=1)  # [T, K, P]
    t_excl = jnp.concatenate(
        [t_full[:, None, :], s[:, :-1, :]], axis=1)            # T_i
    live = s >= _T_EPS
    w = alpha * t_excl * live.astype(alpha.dtype)              # [T, K, P]

    color = color + jnp.einsum("tkp,tkc->tpc", w, rgb)
    depth = depth + jnp.sum(w * z[:, :, None], axis=1)
    # frozen T: smallest surviving s (falls back to the carried value)
    t_cand = jnp.where(live, s, t_true[:, None, :])
    t_true = jnp.minimum(jnp.min(t_cand, axis=1), t_true)
    t_full = s[:, -1, :]
    return (color, depth, t_true, t_full), None


def pack_attributes(means2d, conics, rgb, opacity, depths) -> jnp.ndarray:
    """[N] per-splat render attrs -> one [N, A] row matrix."""
    return jnp.concatenate(
        [means2d, conics, opacity.reshape(-1, 1), rgb,
         depths.reshape(-1, 1)], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("tile_size", "tiles_x", "tiles_y", "tile_cap",
                     "k_chunk"),
)
def blend_tiles(
    sorted_id: jnp.ndarray,   # [D] depth-sorted instance gaussian ids (-1 pad)
    tile_start: jnp.ndarray,  # [num_tiles + 1] instance ranges
    counts: jnp.ndarray,      # [num_tiles]
    means2d: jnp.ndarray,     # [N, 2]
    conics: jnp.ndarray,      # [N, 3]
    rgb: jnp.ndarray,         # [N, 3]
    opacity: jnp.ndarray,     # [N]
    depths: jnp.ndarray,      # [N]
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    tile_cap: int = 1024,
    k_chunk: int = 128,
    tile_ids: jnp.ndarray | None = None,
) -> TileBlendOut:
    """Blend tiles. Returns per-tile pixel buffers (row-major pixels).

    ``tile_ids`` optionally maps rows of ``tile_start``/``counts`` to global
    tile indices — used by the sharded path where each device blends a
    contiguous slice of the tile grid (parallel/step.py).
    """
    num_tiles = counts.shape[0]
    cap, k = tile_cap, k_chunk
    assert cap % k == 0
    p = tile_size * tile_size
    d_total = sorted_id.shape[0]

    # --- pack + reorder into instance order (one row gather) ---
    pack = pack_attributes(means2d, conics, rgb, opacity, depths)  # [N, A]
    safe_sid = jnp.maximum(sorted_id, 0)
    sorted_pack = pack[safe_sid]  # [D, A]
    # pad by one table width so per-tile block slices never clamp: a
    # clamped start would silently read the WRONG range (e.g. every tile
    # reading from row 0 when dup_cap <= tile_cap)
    sorted_pack = jnp.concatenate(
        [sorted_pack, jnp.zeros((cap, sorted_pack.shape[1]),
                                sorted_pack.dtype)], axis=0)

    # --- dense per-tile table via contiguous block slices ---
    starts = jnp.minimum(tile_start[:num_tiles], d_total)

    def row(s):
        return jax.lax.dynamic_slice(sorted_pack, (s, 0), (cap, pack.shape[1]))

    table = jax.vmap(row)(starts)                  # [T, cap, A]
    tab_full = jnp.transpose(table, (2, 0, 1))     # [A, T, cap]
    pos = jnp.arange(cap, dtype=jnp.int32)
    valid_full = pos[None, :] < jnp.minimum(counts, cap)[:, None]  # [T, cap]

    # --- pixel coordinates ---
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = (tile_ids % tiles_x) * tile_size
    ty0 = (tile_ids // tiles_x) * tile_size
    lx = jnp.arange(tile_size, dtype=jnp.int32)
    px = (tx0[:, None, None] + lx[None, None, :]).astype(jnp.float32)
    py = (ty0[:, None, None] + lx[None, :, None]).astype(jnp.float32)
    px = jnp.broadcast_to(px, (num_tiles, tile_size, tile_size)).reshape(num_tiles, p)
    py = jnp.broadcast_to(py, (num_tiles, tile_size, tile_size)).reshape(num_tiles, p)

    # --- compositing scan over K-chunks ---
    color0 = jnp.zeros((num_tiles, p, 3), jnp.float32)
    depth0 = jnp.zeros((num_tiles, p), jnp.float32)
    t0 = jnp.ones((num_tiles, p), jnp.float32)

    blend_step = jax.checkpoint(_blend_chunk)

    def scan_body(carry, c):
        tab = jax.lax.dynamic_slice_in_dim(tab_full, c * k, k, axis=2)
        val = jax.lax.dynamic_slice_in_dim(valid_full, c * k, k, axis=1)
        return blend_step(carry, (tab, val, px, py))

    (color, depth, t_true, _t_full), _ = jax.lax.scan(
        scan_body, (color0, depth0, t0, t0), jnp.arange(cap // k))
    return TileBlendOut(color=color, depth=depth, final_t=t_true)


def tiles_to_image(tile_buf: jnp.ndarray, tiles_x: int, tiles_y: int,
                   tile_size: int, height: int, width: int) -> jnp.ndarray:
    """[T, P(, C)] tile pixel buffers -> [H, W(, C)] image (crop padding)."""
    c_shape = tile_buf.shape[2:]
    img = tile_buf.reshape(tiles_y, tiles_x, tile_size, tile_size, *c_shape)
    img = jnp.moveaxis(img, 2, 1).reshape(
        tiles_y * tile_size, tiles_x * tile_size, *c_shape
    )
    return img[:height, :width]
