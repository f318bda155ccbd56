"""Bilinear grid sampling matching ``torch.nn.functional.grid_sample``.

The reference samples learned/generated feature planes with grid_sample
(``scene/tripFields.py:96,434`` — default args: mode='bilinear',
padding_mode='zeros', align_corners=False) and 3-D grids
(``scene/tripFields.py:114``). On TPU this is a gather + lerp; gathers of
[C, H, W] planes at N points vectorize cleanly on the VPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] to pixel index space (torch convention)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = False,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample a [C, H, W] plane at [N, 2] normalized (x, y) coords.

    torch layout note: grid_sample's last-dim order is (x, y) where x indexes
    W and y indexes H.

    Returns [N, C].
    """
    C, H, W = plane.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        if padding_mode == "border":
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            return plane[:, iyc, ixc]  # [C, N]
        # zeros padding: clamp for the gather, zero the weight outside
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        return plane[:, iyc, ixc] * inb.astype(plane.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)
        + gather(x1, y0) * (wx1 * wy0)
        + gather(x0, y1) * (wx0 * wy1)
        + gather(x1, y1) * (wx1 * wy1)
    )
    return out.T  # [N, C]


def _corners_2d(coords, H, W, align_corners):
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    corners = []
    for iy, wy in ((y0, 1.0 - wy1), (y0 + 1, wy1)):
        for ix, wx in ((x0, 1.0 - wx1), (x0 + 1, wx1)):
            inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            corners.append((iyc, ixc, wx * wy * inb.astype(jnp.float32)))
    return corners


@jax.custom_vjp
def grid_sample_2d_const_coords(plane: jnp.ndarray,
                                coords: jnp.ndarray) -> jnp.ndarray:
    """:func:`grid_sample_2d` (zeros padding, align_corners=False) with a
    TPU-tuned layout per direction and COORDS TREATED AS CONSTANTS.

    Forward gathers ROWS of the [H*W, C] pixel-major layout (each gathered
    row is one contiguous tile fetch — measured 3.7 ms vs 6.2 ms for the
    [C, H, W] advanced-index form at 100k points on v5e), while the
    backward scatter-adds in the channel-major [C, H, W] layout (measured
    4.3 ms vs 6.8 ms for the row-major scatter). Autodiff cannot mix the
    two layouts, hence the custom VJP.

    The coords cotangent is ZERO by construction — callers must only use
    this where coords carry no gradient (the field encoders sample at
    stop_gradient'd splat positions; see train_lib.field_attributes).
    """
    C, H, W = plane.shape
    rows = plane.reshape(C, H * W).T
    out = None
    for iyc, ixc, w in _corners_2d(coords, H, W, False):
        v = rows[iyc * W + ixc] * w[:, None]
        out = v if out is None else out + v
    return out


def _gs2_fwd(plane, coords):
    return grid_sample_2d_const_coords(plane, coords), (plane.shape, coords)


def _gs2_bwd(res, g):
    (C, H, W), coords = res
    gT = g.T  # [C, N]
    grad = jnp.zeros((C, H, W), g.dtype)
    for iyc, ixc, w in _corners_2d(coords, H, W, False):
        grad = grad.at[:, iyc, ixc].add(gT * w[None, :])
    return grad, jnp.zeros_like(coords)


grid_sample_2d_const_coords.defvjp(_gs2_fwd, _gs2_bwd)


def _quad_weights(c, size):
    """Per-axis (low, high) sub-row weights for the quad-packed gather.

    The quad table's row at cell i holds the values of cells (i, i+1), so a
    point whose floor cell is i0 normally weights the halves (w0, w1). Two
    edge cases reroute weights so a single clipped gather index still reads
    the right values:
    - i0 == -1: the gather clamps to cell 0, whose FIRST half holds cell 0
      = the point's i1 corner -> weights (w1, 0).
    - i0 == size-1: the second half wrapped garbage (or zero pad) -> (w0, 0).
    Out-of-range floors get (0, 0) — torch zeros-padding semantics.
    """
    i = jnp.floor(c)
    w1 = c - i
    w0 = 1.0 - w1
    in0 = (i >= 0) & (i <= size - 1)
    a0 = jnp.where(in0, w0, 0.0) + jnp.where(i == -1, w1, 0.0)
    a1 = jnp.where((i >= 0) & (i <= size - 2), w1, 0.0)
    ic = jnp.clip(i, 0, size - 1).astype(jnp.int32)
    return a0, a1, ic


def pack_quad_rows(plane: jnp.ndarray) -> jnp.ndarray:
    """[C, H, W] -> [H*W, 4C] quad table: row (y, x) holds the four bilinear
    corner values [P(y,x), P(y,x+1), P(y+1,x), P(y+1,x+1)] (zero padded at
    the bottom/right edge), so one row gather fetches a whole bilinear
    footprint. N-independent — build once per step next to the CNN decode."""
    C, H, W = plane.shape
    p = jnp.transpose(plane, (1, 2, 0))  # [H, W, C]
    zx = jnp.zeros((H, 1, C), p.dtype)
    zy = jnp.zeros((1, W, C), p.dtype)
    pr = jnp.concatenate([p[:, 1:], zx], axis=1)
    pd = jnp.concatenate([p[1:], zy], axis=0)
    pdr = jnp.concatenate([pd[:, 1:], zx], axis=1)
    return jnp.concatenate([p, pr, pd, pdr], axis=-1).reshape(H * W, 4 * C)


def _quad_idx_w(coords, H, W):
    a0, a1, ixc = _quad_weights(
        _unnormalize(coords[..., 0], W, False), W)
    b0, b1, iyc = _quad_weights(
        _unnormalize(coords[..., 1], H, False), H)
    w4 = jnp.stack([a0 * b0, a1 * b0, a0 * b1, a1 * b1], axis=1)  # [N, 4]
    return iyc * W + ixc, w4


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _quad_sample_idx(quad_rows, idx, w4, gather_dtype=None):
    """Core quad sample on PRECOMPUTED (idx, w4) — lets callers batch many
    planes' lookups into ONE gather/scatter pair (``idx`` may address a
    vertically stacked multi-plane table). ``w4``'s cotangent is zero by
    construction (coords are stop_gradient'd at every call site).

    ``gather_dtype`` (e.g. bf16) rounds the table INSIDE the primal, so
    only forward feature values are rounded — the primal/cotangent stay
    f32 and the plane gradient is exact (the gather traffic halves)."""
    n, C = idx.shape[0], quad_rows.shape[1] // 4
    src = (quad_rows if gather_dtype is None
           else quad_rows.astype(gather_dtype))
    rows = src[idx].astype(jnp.float32)  # ONE gather [N, 4C]
    return jnp.sum(rows.reshape(n, 4, C) * w4[:, :, None], axis=1)


def _quad_idx_fwd(quad_rows, idx, w4, gather_dtype=None):
    return (_quad_sample_idx(quad_rows, idx, w4, gather_dtype),
            (quad_rows.shape, idx, w4))


def _segment_rows_sum(idx: jnp.ndarray, packed: jnp.ndarray, n_rows: int,
                      C: int) -> jnp.ndarray:
    """Scatter-FREE transpose of the quad-row gather: sum ``packed``'s
    per-point (g | w4) rows into their destination table rows using only a
    sort, one row gather, a cumsum and a boundary diff (XLA scatters
    serialize per index on TPU — the same reason binning is scatter-free,
    see ops/raster/binning.py).

    1. sort point slots by destination row (int32 keys + iota payload);
    2. ONE row gather reorders the narrow [N, C+4] (g | w4) pack — cheaper
       than reordering the expanded [N, 4C] update rows;
    3. expand to update rows and take an f32 running prefix sum;
    4. per-table-row sums are prefix differences at segment boundaries,
       located by one searchsorted (a vectorized binary search) and read
       with two [n_rows]-row gathers.

    Summation order inside a row changes from scatter order to sorted-slot
    order and the prefix diff rounds once per boundary. NOTE on accuracy:
    the rounding error of a segment is ABSOLUTE, on the order of the f32
    running-prefix magnitude at that point (which grows with N), not
    relative to the segment's own sum — a near-zero segment late in a
    large array can see error far above 1e-6 of its value. Tests cover
    N~1.2k; if this knob is ever enabled at much larger N, switch the
    cumsum to f64 (CPU) or a pairwise/blocked scheme.

    Measured NEGATIVE end-to-end (SPLATFIELDS_SORTED_PLANE_GRAD=on, bench
    round 3): 57.8 vs 47.2 ms/step — the per-plane sort + reorder gather +
    [N, 4C] cumsum + 25k-query searchsorted cost ~3.5 ms/plane, more than
    the scatters they replace. The round-3 trace attributed 6.96 ms to
    plane 0's scatter but only 1.38 ms to planes 1-2's identical scatters;
    this A/B confirms that attribution was scoped-memory pressure, not
    scatter cost (PERF_FLOOR.md documents the instability). Kept as a knob
    because the balance could flip at much larger N or table sizes.
    """
    n = idx.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx, iota), num_keys=1)
    sp = packed[order]
    sg, sw = sp[:, :C], sp[:, C:]
    rows_g = (sg[:, None, :] * sw[:, :, None]).reshape(n, 4 * C)
    csum = jnp.cumsum(rows_g, axis=0, dtype=jnp.float32)
    csum0 = jnp.concatenate(
        [jnp.zeros((1, 4 * C), jnp.float32), csum], axis=0)
    bounds = jnp.searchsorted(
        sidx, jnp.arange(n_rows + 1, dtype=jnp.int32), side="left")
    seg = csum0[bounds]
    return seg[1:] - seg[:-1]


def _quad_idx_bwd(gather_dtype, res, g):
    (n_rows, C4), idx, w4 = res
    n = idx.shape[0]
    # Both knobs are read at TRACE time (toggling the env var after the
    # step has compiled has no effect until recompilation) and they are
    # mutually exclusive alternatives for the same VJP — refuse ambiguity
    # rather than silently letting the sorted path shadow the Pallas one.
    if (os.environ.get("SPLATFIELDS_SORTED_PLANE_GRAD", "off") == "on"
            and os.environ.get("SPLATFIELDS_PLANE_GRAD_PALLAS", "off")
            == "on"):
        raise ValueError(
            "SPLATFIELDS_SORTED_PLANE_GRAD and SPLATFIELDS_PLANE_GRAD_PALLAS"
            " are both 'on'; they select alternative plane-grad VJPs —"
            " enable at most one (both are read at trace time).")
    if os.environ.get("SPLATFIELDS_SORTED_PLANE_GRAD", "off") == "on":
        grad = _segment_rows_sum(
            idx, jnp.concatenate([g, w4], axis=1), n_rows,
            C4 // 4).astype(g.dtype)
    elif os.environ.get("SPLATFIELDS_PLANE_GRAD_PALLAS", "off") == "on":
        # Pallas MXU segment sum instead of the XLA scatter: sort the
        # slots by destination row (iota payload), reorder the narrow
        # (g | w4) pack with ONE row gather, expand, and mask-matmul
        # per output block (ops/segsum_pallas.py).
        from splatfields_tpu.ops.segsum_pallas import sorted_segment_sum
        iota = jnp.arange(n, dtype=jnp.int32)
        sidx, order = jax.lax.sort((idx, iota), num_keys=1)
        sp = jnp.concatenate([g, w4], axis=1)[order]
        C = C4 // 4
        rows_g = (sp[:, None, :C] * sp[:, C:, None]).reshape(n, C4)
        grad = sorted_segment_sum(sidx, rows_g, n_rows).astype(g.dtype)
    else:
        rows_g = (g[:, None, :] * w4[:, :, None]).reshape(n, C4)
        grad = jnp.zeros((n_rows, C4), g.dtype)
        grad = grad.at[idx].add(rows_g)  # ONE scatter
    return grad, None, jnp.zeros_like(w4)


_quad_sample_idx.defvjp(_quad_idx_fwd, _quad_idx_bwd)


def _quad_sample(quad_rows, coords, hw, gather_dtype=None):
    H, W = hw
    idx, w4 = _quad_idx_w(coords, H, W)
    return _quad_sample_idx(quad_rows, idx, w4, gather_dtype)


def grid_sample_2d_quad_multi(planes, coords_list, gather_dtype=None):
    """Sample P same-size planes at per-plane coords with ONE quad-table
    gather forward and ONE scatter-add backward for the whole set.

    The per-plane form costs one scatter per plane in the VJP; the trace
    showed those scatters dominating the field backward (~8.3 ms/step for
    the 3-plane bench config). Stacking the quad tables vertically and
    offsetting indices batches them: XLA sees a single [P*N -> P*H*W]
    scatter. Plane gradients flow through each ``pack_quad_rows``.

    Args:
        planes: [P, C, H, W] same-size feature planes.
        coords_list: P arrays of [N, 2] normalized coords (coords carry no
            gradient — see _quad_sample_idx).
    Returns [N, P, C].
    """
    p, C, H, W = planes.shape
    tables = jnp.concatenate(
        [pack_quad_rows(planes[i]) for i in range(p)], axis=0)
    idxs, ws = [], []
    for i, coords in enumerate(coords_list):
        idx, w4 = _quad_idx_w(coords, H, W)
        idxs.append(idx + i * H * W)
        ws.append(w4)
    out = _quad_sample_idx(tables, jnp.concatenate(idxs, 0),
                           jnp.concatenate(ws, 0), gather_dtype)  # [P*N, C]
    n = coords_list[0].shape[0]
    return jnp.transpose(out.reshape(p, n, C), (1, 0, 2))


def quad_rows_grad_to_plane(grad_quad: jnp.ndarray, H: int,
                            W: int) -> jnp.ndarray:
    """Fold a [H*W, 4C] quad-table cotangent back to the [C, H, W] plane:
    plane cell (y, x) appears in quad rows (y,x), (y,x-1), (y-1,x),
    (y-1,x-1) — sum the four shifted quarters. (Exposed for tests; the
    training path differentiates through pack_quad_rows instead.)"""
    C4 = grad_quad.shape[1]
    C = C4 // 4
    gq = grad_quad.reshape(H, W, C4)
    p0 = gq[..., :C]
    p1 = gq[..., C:2 * C]
    p2 = gq[..., 2 * C:3 * C]
    p3 = gq[..., 3 * C:]
    zx = jnp.zeros((H, 1, C), gq.dtype)
    zy = jnp.zeros((1, W, C), gq.dtype)
    out = (p0
           + jnp.concatenate([zx, p1[:, :-1]], axis=1)
           + jnp.concatenate([zy, p2[:-1]], axis=0))
    p3s = jnp.concatenate([zx, p3[:, :-1]], axis=1)
    out = out + jnp.concatenate([zy, p3s[:-1]], axis=0)
    return jnp.transpose(out, (2, 0, 1))


def grid_sample_2d_quad(plane: jnp.ndarray, coords: jnp.ndarray,
                        quad_rows: jnp.ndarray | None = None) -> jnp.ndarray:
    """:func:`grid_sample_2d` (zeros padding, align_corners=False) with the
    four bilinear corners PACKED into one row per cell, so the forward is a
    single row gather and the backward a single row scatter-add per plane
    (vs 4 each in :func:`grid_sample_2d_const_coords` — gathers/scatters on
    TPU cost per index, so this is ~4x less index traffic; the 4x-wider
    [H*W, 4C] table costs one cheap elementwise build per step).

    Like const_coords, the coords cotangent is zero by construction. Pass a
    precomputed ``quad_rows`` (from :func:`pack_quad_rows`) to share the
    table build across heads; gradients flow through it to the plane.
    """
    C, H, W = plane.shape
    if quad_rows is None:
        quad_rows = pack_quad_rows(plane)
    return _quad_sample(quad_rows, coords, (H, W))


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = False,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample a [C, D, H, W] grid at [N, 3] normalized (x, y, z) coords.

    torch convention: coords last dim is (x, y, z) indexing (W, H, D).

    Returns [N, C].
    """
    C, D, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    z = _unnormalize(coords[..., 2], D, align_corners)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0

    def gather(ix, iy, iz):
        if padding_mode == "border":
            ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
            return grid[:, izc, iyc, ixc]
        inb = (
            (ix >= 0) & (ix <= W - 1)
            & (iy >= 0) & (iy <= H - 1)
            & (iz >= 0) & (iz <= D - 1)
        )
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        return grid[:, izc, iyc, ixc] * inb.astype(grid.dtype)

    out = (
        gather(x0, y0, z0) * ((1 - fx) * (1 - fy) * (1 - fz))
        + gather(x0 + 1, y0, z0) * (fx * (1 - fy) * (1 - fz))
        + gather(x0, y0 + 1, z0) * ((1 - fx) * fy * (1 - fz))
        + gather(x0 + 1, y0 + 1, z0) * (fx * fy * (1 - fz))
        + gather(x0, y0, z0 + 1) * ((1 - fx) * (1 - fy) * fz)
        + gather(x0 + 1, y0, z0 + 1) * (fx * (1 - fy) * fz)
        + gather(x0, y0 + 1, z0 + 1) * ((1 - fx) * fy * fz)
        + gather(x0 + 1, y0 + 1, z0 + 1) * (fx * fy * fz)
    )
    return out.T
