"""Tile binning: one duplicated-instance sort, scatter-free (pure JAX).

TPU-first replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning (upstream ``ingra14m/depth-diff-gaussian-rasterization``; in-repo
contract documented at SURVEY 2.9). XLA scatters serialize badly on TPU, so
the construction below uses only sorts, binary searches and gathers:

1. gather-based duplication in ORIGINAL Gaussian-id order: with
   per-Gaussian tile-span counts and their exclusive cumsum, duplicate
   slot d maps to Gaussian g (prefix-max trick below) and to the
   (rank % span_x, rank / span_x) tile of its rect — pure vectorized
   arithmetic, no scatter. A static budget ``dup_cap`` bounds the
   instance array; overflow drops the highest-id Gaussians' spillover
   (count reported).
2. ONE sort of the slots by (tile, depth, Gaussian id). This is exactly
   the order the CUDA per-tile (tile | depth-bits) radix sort produces:
   its stability over the id-ordered duplication means equal depths tie
   by id — lexicographic (tile, depth, id). (An earlier pipeline depth-
   argsorted the N Gaussians first and tile-sorted stably; folding depth
   into the slot sort removes the argsort and two N-row gathers.)
3. the dense [num_tiles, tile_cap] gather table is built by a binary
   search (per-tile range starts) + one gather — again scatter-free.

Per-tile overflow beyond ``tile_cap`` is dropped: front-to-back compositing
saturates (T < 1e-4) long before 1024 splats on any realistic scene;
``counts`` lets callers detect overflow.

Not differentiable (indices only) — callers stop gradients through this.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BinningOut(NamedTuple):
    idx: jnp.ndarray      # [num_tiles, cap] int32 gaussian ids, -1 = empty
    counts: jnp.ndarray   # [num_tiles] int32 hits placed in the table
    depth: jnp.ndarray    # [dup_cap] per-slot view depth (+inf pad)
    n_dropped: jnp.ndarray  # scalar: duplicates beyond dup_cap
    sorted_id: jnp.ndarray  # [dup_cap] gaussian id per sorted instance (-1 pad)
    tile_start: jnp.ndarray  # [num_tiles + 1] instance ranges per tile


def tile_rects(means2d: jnp.ndarray, radii: jnp.ndarray, tiles_x: int,
               tiles_y: int, tile_size: int):
    """CUDA getRect: inclusive-exclusive tile ranges clamped to the grid."""
    r = radii.astype(jnp.float32)
    x, y = means2d[:, 0], means2d[:, 1]
    xmin = jnp.clip(((x - r) / tile_size).astype(jnp.int32), 0, tiles_x)
    ymin = jnp.clip(((y - r) / tile_size).astype(jnp.int32), 0, tiles_y)
    xmax = jnp.clip(((x + r + tile_size - 1) / tile_size).astype(jnp.int32), 0, tiles_x)
    ymax = jnp.clip(((y + r + tile_size - 1) / tile_size).astype(jnp.int32), 0, tiles_y)
    return xmin, ymin, xmax, ymax


def _cummax_2level(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D cummax via a 2-level scan: row-wise log-step scan on a
    [R, 128] reshape + a small cross-row carry (direct 1-D lax.cummax on
    ~1M elements is lane-inefficient on TPU)."""
    n = x.shape[0]
    lanes = 128
    rows = -(-n // lanes)
    pad = rows * lanes - n
    xp = jnp.pad(x, (0, pad), constant_values=jnp.iinfo(x.dtype).min
                 if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
    m = xp.reshape(rows, lanes)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    shift = 1
    while shift < lanes:
        rolled = jnp.roll(m, shift, axis=1)
        m = jnp.where(col >= shift, jnp.maximum(m, rolled), m)
        shift *= 2
    row_tot = m[:, -1]
    carry = jax.lax.cummax(row_tot)
    carry_excl = jnp.concatenate(
        [row_tot[:1] * 0 + (jnp.iinfo(x.dtype).min
                            if jnp.issubdtype(x.dtype, jnp.integer)
                            else -jnp.inf), carry[:-1]])
    out = jnp.maximum(m, carry_excl[:, None])
    return out.reshape(-1)[:n]


def duplicate_instances(
    means2d: jnp.ndarray,   # [N, 2] pixel centers
    depths: jnp.ndarray,    # [N] view z
    radii: jnp.ndarray,     # [N] int32, 0 = culled
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    dup_cap: int,
):
    """Scatter-free gather-based duplication (step 2 of the module
    docstring): expand each visible Gaussian into one slot per overlapped
    tile, enumerated in ORIGINAL id order (no depth argsort — callers
    sort slots by ``(tile, depth, id)``, which reproduces the CUDA order
    exactly: its stable radix tile-sort of depth-ordered slots ties equal
    depths by id, i.e. lexicographic (tile, depth, id)).

    Returns ``(tile, gauss_id, total, depth)`` per slot: tile id
    (``num_tiles`` sentinel for unused slots), source Gaussian (-1 pad),
    true instance count (may exceed dup_cap), and the slot's view depth
    (+inf pad). Shared by :func:`bin_gaussians` and the ring-exchange
    path (parallel/ring.py), which re-bins blocks of Gaussians against a
    fixed tile shard."""
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y

    visible = radii > 0
    xmin, ymin, xmax, ymax = tile_rects(means2d, radii, tiles_x, tiles_y,
                                        tile_size)
    span_x_u = jnp.maximum(xmax - xmin, 0)
    span_y_u = jnp.maximum(ymax - ymin, 0)
    counts_per_g = jnp.where(visible, span_x_u * span_y_u, 0)
    ends = jnp.cumsum(counts_per_g)     # inclusive cumsum
    total = ends[-1]
    starts = ends - counts_per_g

    # pack the per-gaussian duplication data into ONE row matrix so every
    # later lookup is a single row gather (TPU gathers fetch a whole
    # (8,128) tile per index — per-attribute gathers are ~5x the traffic).
    # All fields stay int32 — the depth rides along BITCAST to int32 —
    # so ids/offsets are exact at any N (no float32 2^24 ceiling, advisor
    # r2 finding 1) and the ~1.7 ms/step of int<->float converts the old
    # float32 row matrix forced (round-3 trace, fusion over 5x s32[500k])
    # disappear.
    own_id = jnp.arange(n, dtype=jnp.int32)
    row_data = jnp.stack(
        [xmin, ymin, jnp.maximum(span_x_u, 1), own_id, starts,
         jax.lax.bitcast_convert_type(depths, jnp.int32)], axis=1)

    # --- gather-based duplication ---
    d = jnp.arange(dup_cap, dtype=jnp.int32)
    # g[d] = index of the gaussian owning duplicate slot d. Equivalent to
    # searchsorted(ends, d, 'right') but ~5x faster on TPU: scatter each
    # (nonzero-span) gaussian's index at its start offset, then a prefix
    # max (a 17-step binary search costs ~94 ms at this size; one small
    # scatter + scan ~20 ms). Starts of nonzero-span gaussians are unique.
    marks = jnp.zeros((dup_cap,), jnp.int32)
    marks = marks.at[
        jnp.where(counts_per_g > 0, starts, dup_cap)
    ].max(own_id + 1, mode="drop")
    g = _cummax_2level(marks) - 1
    g = jnp.clip(g, 0, n - 1)
    dup_rows = row_data[g]              # ONE row gather [dup_cap, 6]
    rank = d - dup_rows[:, 4]
    sx = dup_rows[:, 2]
    tx = dup_rows[:, 0] + rank % sx
    ty = dup_rows[:, 1] + rank // sx
    dup_valid = d < total
    tile = jnp.where(dup_valid, ty * tiles_x + tx, num_tiles)  # sentinel last
    gauss_id = jnp.where(dup_valid, dup_rows[:, 3], -1)
    depth = jnp.where(
        dup_valid,
        jax.lax.bitcast_convert_type(dup_rows[:, 5], jnp.float32), jnp.inf)
    return tile, gauss_id, total, depth


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_size", "tile_cap",
                     "dup_cap", "build_table"),
)
def bin_gaussians(
    means2d: jnp.ndarray,   # [N, 2] pixel centers
    depths: jnp.ndarray,    # [N] view z
    radii: jnp.ndarray,     # [N] int32, 0 = culled
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    tile_cap: int = 1024,
    dup_cap: int | None = None,
    build_table: bool = True,
) -> BinningOut:
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_cap is None:
        dup_cap = 8 * n

    tile, gauss_id, total, depth = duplicate_instances(
        means2d, depths, radii, tiles_x, tiles_y, tile_size, dup_cap)

    # --- ONE sort by (tile, depth, id) ---
    # Replaces the previous depth-argsort-then-stable-tile-sort pipeline:
    # the lexicographic order is identical (CUDA's stable radix tile sort
    # of depth-ordered slots ties equal depths by id), and the N-point
    # argsort + its row gathers disappear. gauss_id rides as the third
    # KEY (it IS the tie-break), so no payload operand is needed; -1 pads
    # map to int32 max so they stay last within the sentinel tile.
    gid_key = jnp.where(gauss_id >= 0, gauss_id, jnp.iinfo(jnp.int32).max)
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile, depth, gid_key), num_keys=3)
    sorted_id = jnp.where(sorted_tile < num_tiles, sorted_gid, -1)

    # --- per-tile ranges + gather table ---
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_count = tile_start[1:] - tile_start[:-1]  # [num_tiles]

    if build_table:
        # dense [T, cap] id table — only the XLA blend needs it; the
        # Pallas kernel reads the sorted array + ranges directly
        pos = jnp.arange(tile_cap, dtype=jnp.int32)
        gather_pos = tile_start[:-1, None] + pos[None, :]      # [T, cap]
        in_range = pos[None, :] < tile_count[:, None]
        gather_pos = jnp.minimum(gather_pos, dup_cap - 1)
        idx = jnp.where(in_range, sorted_id[gather_pos], -1)
    else:
        idx = jnp.zeros((0, 0), jnp.int32)

    n_dropped = jnp.maximum(total - dup_cap, 0)
    return BinningOut(idx=idx, counts=tile_count, depth=depth,
                      n_dropped=n_dropped, sorted_id=sorted_id,
                      tile_start=tile_start)
