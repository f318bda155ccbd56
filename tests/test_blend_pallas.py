"""Pallas blend kernel vs the JAX blend (interpret mode on CPU):
forward outputs and input gradients must match."""
import numpy as np
import jax
import jax.numpy as jnp

from splatfields_tpu.ops.raster import blend_jax
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
from tests.test_raster import make_scene


def setup_scene(n=192, seed=0, width=64, height=48):
    s = make_scene(n=n, seed=seed, width=width, height=height)
    pre = preprocess(
        jnp.asarray(s["means3d"]), jnp.asarray(s["scales"]),
        jnp.asarray(s["rotations"]), jnp.asarray(s["opacities"]),
        jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
        s["width"], s["height"], s["tanfovx"], s["tanfovy"],
        colors_precomp=jnp.asarray(s["colors_precomp"]))
    tiles_x, tiles_y = -(-width // 16), -(-height // 16)
    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii,
                            tiles_x, tiles_y, 16, tile_cap=256,
                            dup_cap=4096)
    return s, pre, binning, tiles_x, tiles_y


class TestPallasForward:
    def test_matches_jax_blend(self):
        s, pre, binning, tx, ty = setup_scene()
        ref = blend_jax.blend_tiles(
            binning.sorted_id, binning.tile_start, binning.counts,
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths,
            tx, ty, 16, tile_cap=256, k_chunk=64)
        pack = blend_jax.pack_attributes(
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
        color, depth, tfinal = blend_sorted_pallas(
            sorted_pack, binning.tile_start, binning.counts,
            tx, ty, 16, 256, 128, True)
        np.testing.assert_allclose(
            np.asarray(color), np.transpose(np.asarray(ref.color), (0, 2, 1)),
            atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tfinal),
                                   np.asarray(ref.final_t),
                                   atol=1e-5, rtol=1e-4)

    def test_heavy_overlap_early_termination(self):
        s, pre, binning, tx, ty = setup_scene(n=96, seed=3)
        # saturate: big opaque splats
        s2 = make_scene(n=96, seed=3)
        s2["scales"] = np.full_like(s2["scales"], 0.5)
        s2["opacities"] = np.full_like(s2["opacities"], 0.95)
        pre = preprocess(
            jnp.asarray(s2["means3d"]), jnp.asarray(s2["scales"]),
            jnp.asarray(s2["rotations"]), jnp.asarray(s2["opacities"]),
            jnp.asarray(s2["viewmatrix"]), jnp.asarray(s2["projmatrix"]),
            s2["width"], s2["height"], s2["tanfovx"], s2["tanfovy"],
            colors_precomp=jnp.asarray(s2["colors_precomp"]))
        binning = bin_gaussians(pre.means2d, pre.depths, pre.radii,
                                tx, ty, 16, tile_cap=256, dup_cap=4096)
        ref = blend_jax.blend_tiles(
            binning.sorted_id, binning.tile_start, binning.counts,
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths,
            tx, ty, 16, tile_cap=256, k_chunk=64)
        pack = blend_jax.pack_attributes(
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
        color, depth, tfinal = blend_sorted_pallas(
            sorted_pack, binning.tile_start, binning.counts,
            tx, ty, 16, 256, 128, True)
        np.testing.assert_allclose(
            np.asarray(color), np.transpose(np.asarray(ref.color), (0, 2, 1)),
            atol=1e-5, rtol=1e-3)


class TestPallasTileIdsSlice:
    """The sharded step blends a SLICE of the tile grid, passing global
    ``tile_ids`` so pixel coordinates come from the global grid position
    (parallel/step.py:135-142). The round-1 advisor's high-severity bug
    lived exactly here (local grid step used as the global tile id); this
    pins the fix: a sliced blend must equal the same rows of a full-grid
    blend, forward AND gradients."""

    def test_slice_matches_full_grid(self):
        s, pre, binning, tx, ty = setup_scene(n=160, seed=11)
        pack = blend_jax.pack_attributes(
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]
        num_tiles = binning.counts.shape[0]
        assert num_tiles >= 6

        # full-grid blend (identity tile_ids)
        c_full, d_full, t_full = blend_sorted_pallas(
            sorted_pack, binning.tile_start, binning.counts,
            tx, ty, 16, 256, 128, True)

        # slice: tiles [lo, hi) exactly as parallel/step.py carves them
        lo, hi = 2, 6
        t_loc = hi - lo
        local_starts = jax.lax.dynamic_slice_in_dim(
            binning.tile_start, lo, t_loc + 1, 0)
        local_counts = jax.lax.dynamic_slice_in_dim(
            binning.counts, lo, t_loc, 0)
        local_ids = lo + jnp.arange(t_loc, dtype=jnp.int32)

        c_sl, d_sl, t_sl = blend_sorted_pallas(
            sorted_pack, local_starts, local_counts,
            tx, ty, 16, 256, 128, True, tile_ids=local_ids)
        np.testing.assert_allclose(np.asarray(c_sl),
                                   np.asarray(c_full)[lo:hi],
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d_sl),
                                   np.asarray(d_full)[lo:hi],
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t_sl),
                                   np.asarray(t_full)[lo:hi],
                                   atol=1e-6, rtol=1e-5)

        # gradients: cotangents on the slice vs the same rows of the full
        # grid (rows outside the slice get zero cotangent)
        rng = np.random.RandomState(2)
        gc = jnp.asarray(rng.rand(t_loc, 3, 256).astype(np.float32))
        gd = jnp.asarray(rng.rand(t_loc, 256).astype(np.float32))
        gt = jnp.asarray(rng.rand(t_loc, 256).astype(np.float32))

        def loss_slice(sp):
            c, d, t = blend_sorted_pallas(
                sp, local_starts, local_counts, tx, ty, 16, 256, 128,
                True, tile_ids=local_ids)
            return jnp.sum(c * gc) + jnp.sum(d * gd) + jnp.sum(t * gt)

        def loss_full(sp):
            c, d, t = blend_sorted_pallas(
                sp, binning.tile_start, binning.counts, tx, ty, 16, 256,
                128, True)
            return (jnp.sum(c[lo:hi] * gc) + jnp.sum(d[lo:hi] * gd)
                    + jnp.sum(t[lo:hi] * gt))

        g_slice = np.asarray(jax.grad(loss_slice)(sorted_pack))
        g_full = np.asarray(jax.grad(loss_full)(sorted_pack))
        scale = np.abs(g_full).max() + 1e-8
        np.testing.assert_allclose(g_slice / scale, g_full / scale,
                                   atol=1e-6, rtol=1e-4)


class TestPallasBackward:
    def test_grads_match_jax_blend(self):
        s, pre, binning, tx, ty = setup_scene(n=128, seed=7)
        pack = blend_jax.pack_attributes(
            pre.means2d, pre.conics, pre.rgb, pre.opacity, pre.depths)
        sorted_pack = pack[jnp.maximum(binning.sorted_id, 0)]

        rng = np.random.RandomState(1)
        num_tiles = binning.counts.shape[0]
        gc = jnp.asarray(rng.rand(num_tiles, 3, 256).astype(np.float32))
        gd = jnp.asarray(rng.rand(num_tiles, 256).astype(np.float32) * 0.1)
        gt = jnp.asarray(rng.rand(num_tiles, 256).astype(np.float32) * 0.1)

        def loss_pallas(sp):
            c, d, t = blend_sorted_pallas(
                sp, binning.tile_start, binning.counts, tx, ty, 16, 256,
                128, True)
            return jnp.sum(c * gc) + jnp.sum(d * gd) + jnp.sum(t * gt)

        def loss_jax(sp):
            # reimplement blend_jax on the packed input for grad comparison
            out = blend_jax.blend_tiles(
                binning.sorted_id, binning.tile_start, binning.counts,
                sp[:, 0:2], sp[:, 2:5], sp[:, 6:9], sp[:, 5], sp[:, 9],
                tx, ty, 16, tile_cap=256, k_chunk=64)
            # blend_jax regathers internally from N-arrays; here we pass the
            # sorted pack as if it were the N-array with sorted_id=identity
            return out

        # jax reference loss via identity binning over the sorted pack
        ident = blend_jax.blend_tiles(
            jnp.arange(sorted_pack.shape[0], dtype=jnp.int32),
            binning.tile_start, binning.counts,
            sorted_pack[:, 0:2], sorted_pack[:, 2:5], sorted_pack[:, 6:9],
            sorted_pack[:, 5], sorted_pack[:, 9],
            tx, ty, 16, tile_cap=256, k_chunk=64)

        def loss_jax_ident(sp):
            out = blend_jax.blend_tiles(
                jnp.arange(sp.shape[0], dtype=jnp.int32),
                binning.tile_start, binning.counts,
                sp[:, 0:2], sp[:, 2:5], sp[:, 6:9], sp[:, 5], sp[:, 9],
                tx, ty, 16, tile_cap=256, k_chunk=64)
            return (jnp.sum(jnp.transpose(out.color, (0, 2, 1)) * gc)
                    + jnp.sum(out.depth * gd) + jnp.sum(out.final_t * gt))

        g_pallas = np.asarray(jax.grad(loss_pallas)(sorted_pack))
        g_jax = np.asarray(jax.grad(loss_jax_ident)(sorted_pack))
        scale = np.abs(g_jax).max() + 1e-8
        np.testing.assert_allclose(g_pallas / scale, g_jax / scale,
                                   atol=5e-5, rtol=1e-3)
