"""K-nearest-neighbor queries as tiled pairwise-distance + top-k.

TPU-native replacement for the two CUDA/ext KNNs in the reference:
- ``simple_knn._C.distCUDA2`` (mean squared distance to 3 nearest
  neighbors, used for splat scale init — reference
  ``scene/gaussian_model.py:105``): :func:`mean_sq_dist_knn3`.
- ``pytorch3d.ops.knn_points`` K=5 for the Moran's-I losses (reference
  ``extract_geo.py:100-109``): :func:`knn_self`.

Design: exact KNN via row-chunked pairwise distances with a running top-k
merge. Each chunk computes a [CHUNK, N] distance block with one MXU matmul
(|a-b|^2 = |a|^2 + |b|^2 - 2 a.b) and reduces it with ``lax.top_k`` —
O(N^2) FLOPs but fully dense and MXU-resident; exact (no spatial-grouping
approximation like the upstream CUDA BVH).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_rows(x: jnp.ndarray, multiple: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], 1e10, x.dtype)], 0)
    return x, n


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_self(points: jnp.ndarray, k: int = 5, chunk: int = 1024):
    """Exact K nearest neighbors of each point among the same set
    (self excluded).

    Args:
        points: [N, 3] float32.
        k: neighbor count.
        chunk: rows per distance block (controls peak memory: chunk*N floats).
    Returns:
        (dists, idx): [N, k] squared distances and neighbor indices, sorted
        ascending.
    """
    pts, n = _pad_rows(points.astype(jnp.float32), chunk)
    np_ = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)  # [Np]

    def body(i, carry):
        dists, idx = carry
        rows = jax.lax.dynamic_slice_in_dim(pts, i * chunk, chunk)
        row_sq = jax.lax.dynamic_slice_in_dim(sq, i * chunk, chunk)
        # [chunk, Np] squared distances via one matmul
        d = row_sq[:, None] + sq[None, :] - 2.0 * (rows @ pts.T)
        # mask self-matches
        row_ids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, np_), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, np_), 1)
        d = jnp.where(row_ids == col_ids, jnp.inf, d)
        # mask padded columns
        d = jnp.where(col_ids >= n, jnp.inf, d)
        top_d, top_i = jax.lax.top_k(-d, k)
        dists = jax.lax.dynamic_update_slice_in_dim(dists, -top_d, i * chunk, 0)
        idx = jax.lax.dynamic_update_slice_in_dim(idx, top_i, i * chunk, 0)
        return dists, idx

    n_chunks = np_ // chunk
    dists0 = jnp.zeros((np_, k), jnp.float32)
    idx0 = jnp.zeros((np_, k), jnp.int32)
    dists, idx = jax.lax.fori_loop(0, n_chunks, body, (dists0, idx0))
    return dists[:n], idx[:n]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_points(queries: jnp.ndarray, points: jnp.ndarray, k: int = 8,
               chunk: int = 1024):
    """Exact K nearest ``points`` for each of ``queries`` (cross-set;
    the pytorch3d ``knn_points`` shape of the problem).

    Args:
        queries: [M, 3] float32.
        points: [N, 3] float32 reference set.
        k: neighbor count.
        chunk: query rows per distance block (peak memory: chunk*N floats).
    Returns:
        (dists, idx): [M, k] squared distances (ascending) and indices
        into ``points``.
    """
    pts = points.astype(jnp.float32)
    qs, m = _pad_rows(queries.astype(jnp.float32), chunk)
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)

    def body(i, carry):
        dists, idx = carry
        rows = jax.lax.dynamic_slice_in_dim(qs, i * chunk, chunk)
        d = (jnp.sum(rows * rows, axis=-1)[:, None] + sq[None, :]
             - 2.0 * (rows @ pts.T))
        top_d, top_i = jax.lax.top_k(-d, k)
        dists = jax.lax.dynamic_update_slice_in_dim(
            dists, -top_d, i * chunk, 0)
        idx = jax.lax.dynamic_update_slice_in_dim(idx, top_i, i * chunk, 0)
        return dists, idx

    n_chunks = qs.shape[0] // chunk
    dists0 = jnp.zeros((qs.shape[0], k), jnp.float32)
    idx0 = jnp.zeros((qs.shape[0], k), jnp.int32)
    dists, idx = jax.lax.fori_loop(0, n_chunks, body, (dists0, idx0))
    return jnp.maximum(dists[:m], 0.0), idx[:m]


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_sq_dist_knn3(points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors, clamped at 1e-7.

    distCUDA2 equivalent (reference ``scene/gaussian_model.py:105``, upstream
    simple-knn). The clamp mirrors ``torch.clamp_min(..., 1e-7)`` at the
    call site.
    """
    d, _ = knn_self(points, k=3, chunk=chunk)
    return jnp.maximum(jnp.mean(d, axis=-1), 1e-7)


def query_nn(points: jnp.ndarray, n_neighbors: int = 5, eps: float = 1e-5):
    """Neighborhood cross-distance weights for Moran's I.

    Parity: reference ``extract_geo.py:100-109`` (``query_nn``): KNN with
    K=5 *including self* (sorted ascending, so neighborhood[0] is the point
    itself), then pairwise distances within each K-neighborhood converted to
    inverse-distance weights (eps floor on the diagonal / coincident pairs),
    normalized by the total weight of the neighborhood.

    Returns:
        (weights [N, K, K], idx [N, K]).
    """
    k = n_neighbors
    # pytorch3d knn_points includes self as the first (distance-0) neighbor:
    # take k-1 true neighbors and prepend self.
    d, idx = knn_self(points, k=k - 1, chunk=1024)
    self_idx = jnp.arange(points.shape[0], dtype=idx.dtype)[:, None]
    idx = jnp.concatenate([self_idx, idx], axis=-1)  # [N, K]
    nbr = points[idx]  # [N, K, 3]
    diff = nbr[:, :, None, :] - nbr[:, None, :, :]
    cross = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # [N,K,K]
    weights = jnp.where(cross > eps, 1.0 / jnp.maximum(cross, eps), eps)
    norm = jnp.maximum(jnp.sum(weights, axis=(1, 2), keepdims=True), 1e-5)
    return weights / norm, idx


def morans_measure(weights: jnp.ndarray, feats_nn: jnp.ndarray) -> jnp.ndarray:
    """Moran's I over per-point neighborhoods.

    Parity: reference ``extract_geo.py:111-137`` (``morans_measure``):
    for each neighborhood b of size K with weights w [K, K] and
    (un-centered) features x [K, F]:
    I_b,f = (K / W_b) * sum_ij w_ij x_i x_j / (sum_i x_i^2 + 1e-4),
    averaged over all neighborhoods and channels.

    Args:
        weights: [N, K, K] normalized neighborhood weights.
        feats_nn: [N, K, F] features gathered at the KNN indices.
    """
    k = feats_nn.shape[1]
    w_total = jnp.sum(weights, axis=(1, 2))[:, None, None]  # [N,1,1]
    w_ij = (k / w_total) * weights  # [N, K, K]
    denom = jnp.sum(feats_nn**2, axis=1)  # [N, F]
    # nom[b, f] = sum_ij w_ij[b] x[b,i,f] x[b,j,f]
    nom = jnp.einsum("bij,bif,bjf->bf", w_ij, feats_nn, feats_nn)
    moran = nom / (denom + 1e-4)
    return moran.mean()


def morans_loss(weights: jnp.ndarray, feats_nn: jnp.ndarray) -> jnp.ndarray:
    """1 - clamp(Moran's I, 0, 1) — penalizes spatially uncorrelated splat
    attributes (reference ``extract_geo.py:140-143``)."""
    return 1.0 - jnp.clip(morans_measure(weights, feats_nn), 0.0, 1.0)
