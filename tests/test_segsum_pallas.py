"""Sorted-segment-sum Pallas kernel vs the XLA scatter (interpret mode).

The kernel (ops/segsum_pallas.py) replaces ``zeros.at[idx].add(rows)`` in
the quad-table plane-grad VJP; these tests pin its math against the
scatter across the shapes that stress its block/chunk logic: empty
segments, hot segments spanning many DMA chunks, non-chunk-multiple N,
non-128 feature widths, and out-of-range ids.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatfields_tpu.ops import grid_sample as gs_ops
from splatfields_tpu.ops.segsum_pallas import sorted_segment_sum


def _scatter_ref(sidx, vals, n_rows):
    keep = (sidx >= 0) & (sidx < n_rows)
    out = np.zeros((n_rows, vals.shape[1]), np.float64)
    for j in range(sidx.shape[0]):
        if keep[j]:
            out[sidx[j]] += vals[j].astype(np.float64)
    return out.astype(np.float32)


class TestSortedSegmentSum:
    @pytest.mark.parametrize("n,n_rows,d,k,r_block", [
        (1000, 256, 64, 128, 128),   # several blocks, several chunks
        (700, 384, 20, 256, 128),    # non-128 feature width, ragged N
        (50, 1024, 64, 128, 128),    # mostly-empty rows
        (900, 700, 2, 512, 256),     # wide output block (NGP shape), d=2
    ])
    def test_matches_scatter(self, n, n_rows, d, k, r_block):
        rng = np.random.RandomState(3 + n)
        sidx = np.sort(rng.randint(0, n_rows, n)).astype(np.int32)
        vals = rng.randn(n, d).astype(np.float32)
        out = sorted_segment_sum(jnp.asarray(sidx), jnp.asarray(vals),
                                 n_rows, k=k, r_block=r_block)
        np.testing.assert_allclose(np.asarray(out),
                                   _scatter_ref(sidx, vals, n_rows),
                                   rtol=1e-5, atol=1e-5)

    def test_hot_segment_many_chunks(self):
        """All updates in ONE row: a single block loops over every chunk."""
        rng = np.random.RandomState(7)
        n, n_rows, d = 2000, 256, 64
        sidx = np.full(n, 129, np.int32)  # row in block 1
        vals = rng.randn(n, d).astype(np.float32)
        out = sorted_segment_sum(jnp.asarray(sidx), jnp.asarray(vals),
                                 n_rows, k=128)
        ref = _scatter_ref(sidx, vals, n_rows)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=1e-4, atol=1e-4)
        assert float(jnp.abs(out[:129]).max()) == 0.0
        assert float(jnp.abs(out[130:]).max()) == 0.0

    def test_out_of_range_ids_dropped(self):
        rng = np.random.RandomState(11)
        n_rows, d = 128, 8
        sidx = np.array([-3, -1, 0, 5, 5, 127, 128, 400], np.int32)
        vals = rng.randn(len(sidx), d).astype(np.float32)
        out = sorted_segment_sum(jnp.asarray(sidx), jnp.asarray(vals),
                                 n_rows)
        np.testing.assert_allclose(np.asarray(out),
                                   _scatter_ref(sidx, vals, n_rows),
                                   rtol=1e-5, atol=1e-5)

    def test_quad_multi_grad_knob_path(self, monkeypatch):
        """QUAD_MULTI + PLANE_GRAD_PALLAS batches all planes into ONE sort
        + ONE kernel call (idx offset per plane); gradients must still
        match the per-plane scatter path."""
        rng = np.random.RandomState(17)
        planes = jnp.asarray(rng.randn(3, 4, 9, 7).astype(np.float32))
        pts = jnp.asarray(rng.rand(400, 3).astype(np.float32) * 2.4 - 1.2)
        axes = ((0, 1), (1, 2), (2, 0))
        coords_list = [pts[:, list(ax)] for ax in axes]
        g = jnp.asarray(rng.rand(400, 3, 4).astype(np.float32))

        def loss(p):
            return jnp.sum(
                gs_ops.grid_sample_2d_quad_multi(p, coords_list) * g)

        g_ref = jax.grad(loss)(planes)
        monkeypatch.setenv("SPLATFIELDS_PLANE_GRAD_PALLAS", "on")
        g_kernel = jax.grad(loss)(planes)
        np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-4)

    def test_quad_grad_knob_path(self, monkeypatch):
        """SPLATFIELDS_PLANE_GRAD_PALLAS=on routes the quad-table VJP
        through the kernel; the plane gradient must match the scatter
        path to float tolerance."""
        rng = np.random.RandomState(13)
        plane = jnp.asarray(rng.randn(6, 17, 13).astype(np.float32))
        hot = np.tile(np.array([[0.31, -0.47]], np.float32), (300, 1))
        hot += rng.randn(300, 2).astype(np.float32) * 1e-3
        coords = jnp.asarray(np.concatenate([
            hot,
            rng.rand(700, 2).astype(np.float32) * 2.4 - 1.2,
            np.array([[-1.4, 0.0], [0.0, 1.4]], np.float32),
        ]))
        g = jnp.asarray(rng.rand(coords.shape[0], 6).astype(np.float32))

        def loss(p):
            return jnp.sum(gs_ops.grid_sample_2d_quad(p, coords) * g)

        g_scatter = jax.grad(loss)(plane)
        monkeypatch.setenv("SPLATFIELDS_PLANE_GRAD_PALLAS", "on")
        g_kernel = jax.grad(loss)(plane)
        np.testing.assert_allclose(np.asarray(g_kernel),
                                   np.asarray(g_scatter),
                                   rtol=1e-5, atol=1e-4)
