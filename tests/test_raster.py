"""Rasterizer tests: TPU tile pipeline vs the sequential NumPy oracle,
plus gradient sanity (finite differences through the full pipeline)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatfields_tpu.ops.raster.api import rasterize
from splatfields_tpu.ops.raster.oracle import rasterize_oracle
from splatfields_tpu.utils import camera_math as cm


def make_scene(n=256, seed=0, width=64, height=48):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = (0.02 + 0.08 * rng.rand(n, 3)).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    ops = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    colors = rng.rand(n, 3).astype(np.float32)

    # camera looking at origin from z=-4 (w2c translation +z)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 4.0], np.float32)
    w2v = cm.get_world2view(R, t).T  # transposed storage
    fovx, fovy = 0.8, 0.6
    proj = cm.get_projection_matrix(0.01, 100.0, fovx, fovy).T
    full = w2v @ proj
    campos = np.linalg.inv(w2v.T)[:3, 3]
    import math
    return dict(
        means3d=means, scales=scales, rotations=rots, opacities=ops,
        colors_precomp=colors, viewmatrix=w2v, projmatrix=full,
        campos=campos.astype(np.float32),
        bg=np.array([1.0, 1.0, 1.0], np.float32),
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        width=width, height=height,
    )


def run_tile(s, **kw):
    return rasterize(
        jnp.asarray(s["means3d"]), jnp.asarray(s["scales"]),
        jnp.asarray(s["rotations"]), jnp.asarray(s["opacities"]),
        jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
        jnp.asarray(s["campos"]), jnp.asarray(s["bg"]),
        s["tanfovx"], s["tanfovy"], s["width"], s["height"],
        colors_precomp=jnp.asarray(s["colors_precomp"]),
        **kw,
    )


def run_oracle(s):
    return rasterize_oracle(
        s["means3d"], s["scales"], s["rotations"], s["opacities"],
        s["viewmatrix"], s["projmatrix"], s["campos"], s["bg"],
        s["tanfovx"], s["tanfovy"], s["width"], s["height"],
        colors_precomp=s["colors_precomp"],
    )


class TestForwardVsOracle:
    def test_color_depth_alpha_match(self):
        s = make_scene()
        got = run_tile(s, tile_cap=512, k_chunk=64)
        want = run_oracle(s)
        np.testing.assert_allclose(np.asarray(got.color), want["color"],
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got.depth), want["depth"],
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got.alpha), want["alpha"],
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(got.radii), want["radii"])

    def test_dense_overlap_scene(self):
        # heavy overlap: many large gaussians on top of each other ->
        # exercises early termination (T < 1e-4)
        s = make_scene(n=128, seed=3)
        s["scales"] = np.full_like(s["scales"], 0.5)
        s["opacities"] = np.full_like(s["opacities"], 0.9)
        got = run_tile(s, tile_cap=256, k_chunk=32, dup_cap=4096)
        want = run_oracle(s)
        np.testing.assert_allclose(np.asarray(got.color), want["color"],
                                   atol=5e-5, rtol=1e-3)

    def test_empty_scene_is_background(self):
        s = make_scene(n=16)
        s["means3d"] = s["means3d"] + np.array([0, 0, -100], np.float32)  # behind cam
        got = run_tile(s, tile_cap=128, k_chunk=32)
        np.testing.assert_allclose(
            np.asarray(got.color), np.ones((3, s["height"], s["width"])), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(got.alpha), 0.0, atol=1e-6)

    def test_sh_color_path(self):
        s = make_scene(n=64, seed=5)
        rng = np.random.RandomState(7)
        shs = (rng.randn(64, 4, 3) * 0.3).astype(np.float32)
        got = rasterize(
            jnp.asarray(s["means3d"]), jnp.asarray(s["scales"]),
            jnp.asarray(s["rotations"]), jnp.asarray(s["opacities"]),
            jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
            jnp.asarray(s["campos"]), jnp.asarray(s["bg"]),
            s["tanfovx"], s["tanfovy"], s["width"], s["height"],
            shs=jnp.asarray(shs), sh_degree=1,
            tile_cap=128, k_chunk=32,
        )
        want = rasterize_oracle(
            s["means3d"], s["scales"], s["rotations"], s["opacities"],
            s["viewmatrix"], s["projmatrix"], s["campos"], s["bg"],
            s["tanfovx"], s["tanfovy"], s["width"], s["height"],
            shs=shs, sh_degree=1,
        )
        np.testing.assert_allclose(np.asarray(got.color), want["color"],
                                   atol=5e-5, rtol=1e-3)


def dense_reference_render(means3d, scales, rotations, opacities, s):
    """Independent dense differentiable blend: all gaussians vs all pixels,
    full-length cumprod, no tiles / caps / chunking. Shares only the
    preprocess stage with the production path."""
    from splatfields_tpu.ops.raster.preprocess import preprocess

    pre = preprocess(
        means3d, scales, rotations, opacities,
        jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
        s["width"], s["height"], s["tanfovx"], s["tanfovy"],
        colors_precomp=jnp.asarray(s["colors_precomp"]),
    )
    order = jnp.argsort(jnp.where(pre.radii > 0, pre.depths, jnp.inf), stable=True)
    order = jax.lax.stop_gradient(order)
    mx, my = pre.means2d[order, 0], pre.means2d[order, 1]
    ca, cb, cc = pre.conics[order, 0], pre.conics[order, 1], pre.conics[order, 2]
    op = pre.opacity[order] * (pre.radii[order] > 0)
    rgb = pre.rgb[order]
    xs, ys = jnp.meshgrid(
        jnp.arange(s["width"], dtype=jnp.float32),
        jnp.arange(s["height"], dtype=jnp.float32))
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    dx = mx[:, None] - px[None, :]
    dy = my[:, None] - py[None, :]
    power = -0.5 * (ca[:, None] * dx**2 + cc[:, None] * dy**2) - cb[:, None] * dx * dy
    alpha = jnp.minimum(0.99, op[:, None] * jnp.exp(power))
    alpha = jnp.where((power > 0) | (alpha < 1 / 255), 0.0, alpha)
    one_m = 1 - alpha
    t_full = jnp.concatenate(
        [jnp.ones_like(one_m[:1]), jnp.cumprod(one_m[:-1], 0)], 0)
    trig = (t_full * one_m < 1e-4) & (alpha > 0)
    done_incl = jnp.cumsum(trig.astype(jnp.int32), 0) > 0
    w = alpha * t_full * (~done_incl)
    color = jnp.einsum("np,nc->pc", w, rgb)
    t_final = jnp.prod(1 - alpha * (~done_incl), 0)
    color = color + t_final[:, None] * jnp.asarray(s["bg"])[None]
    return color.reshape(s["height"], s["width"], 3)


class TestGradients:
    @pytest.mark.parametrize("argname", ["means3d", "opacities", "colors"])
    def test_grads_match_dense_reference(self, argname):
        s = make_scene(n=48, seed=11, width=32, height=32)

        def loss_tile(means, ops, cols):
            out = rasterize(
                means, jnp.asarray(s["scales"]), jnp.asarray(s["rotations"]),
                ops, jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
                jnp.asarray(s["campos"]), jnp.asarray(s["bg"]),
                s["tanfovx"], s["tanfovy"], s["width"], s["height"],
                colors_precomp=cols, tile_cap=64, k_chunk=32,
            )
            return jnp.sum(out.color ** 2)

        def loss_dense(means, ops, cols):
            s2 = dict(s)
            s2["colors_precomp"] = cols
            img = dense_reference_render(
                means, jnp.asarray(s["scales"]), jnp.asarray(s["rotations"]),
                ops, s2)
            return jnp.sum(jnp.transpose(img, (2, 0, 1)) ** 2)

        args = (jnp.asarray(s["means3d"]), jnp.asarray(s["opacities"]),
                jnp.asarray(s["colors_precomp"]))
        argnum = {"means3d": 0, "opacities": 1, "colors": 2}[argname]
        g_tile = np.asarray(jax.grad(loss_tile, argnums=argnum)(*args))
        g_dense = np.asarray(jax.grad(loss_dense, argnums=argnum)(*args))
        scale = np.abs(g_dense).max() + 1e-8
        np.testing.assert_allclose(g_tile / scale, g_dense / scale,
                                   atol=2e-5, rtol=1e-3)

    def test_screenspace_offset_grad_nonzero(self):
        s = make_scene(n=32, seed=17, width=32, height=32)
        zeros = jnp.zeros((32, 2), jnp.float32)

        def loss_fn(off):
            out = rasterize(
                jnp.asarray(s["means3d"]), jnp.asarray(s["scales"]),
                jnp.asarray(s["rotations"]), jnp.asarray(s["opacities"]),
                jnp.asarray(s["viewmatrix"]), jnp.asarray(s["projmatrix"]),
                jnp.asarray(s["campos"]), jnp.asarray(s["bg"]),
                s["tanfovx"], s["tanfovy"], s["width"], s["height"],
                colors_precomp=jnp.asarray(s["colors_precomp"]),
                screenspace_offset=off, tile_cap=64, k_chunk=32,
            )
            return jnp.sum(out.color ** 2)

        g = np.asarray(jax.grad(loss_fn)(zeros))
        assert np.abs(g).max() > 0  # densification stats signal exists


class TestTileEdgeCases:
    def test_non_divisible_image_size(self):
        s = make_scene(n=64, seed=19, width=50, height=37)
        got = run_tile(s, tile_cap=128, k_chunk=32)
        want = run_oracle(s)
        assert got.color.shape == (3, 37, 50)
        np.testing.assert_allclose(np.asarray(got.color), want["color"],
                                   atol=5e-5, rtol=1e-3)

    def test_tile_cap_overflow_drops_far_tail_only(self):
        # With a generous cap the result equals the oracle; with a tiny cap
        # the front-most splats still match (saturated pixels unaffected).
        s = make_scene(n=128, seed=23)
        s["opacities"] = np.full_like(s["opacities"], 0.99)
        s["scales"] = np.full_like(s["scales"], 0.4)
        want = run_oracle(s)
        big = np.asarray(run_tile(s, tile_cap=256, k_chunk=32, dup_cap=4096).color)
        small = np.asarray(run_tile(s, tile_cap=64, k_chunk=32, dup_cap=4096).color)
        # generous cap: exact; tiny cap: bounded leak (saturated pixels only)
        np.testing.assert_allclose(big, want["color"], atol=5e-5, rtol=1e-3)
        assert np.abs(big - small).max() < 0.06


class TestDepthTies:
    def test_equal_depth_deterministic_id_order(self):
        """Splats at identical depth blend in gaussian-id order (the CUDA
        radix sort is stable over the id-ordered duplication)."""
        s = make_scene(n=8, seed=31)
        s["means3d"][:, 2] = 0.0   # all at the same view depth
        s["means3d"][:, :2] = 0.05 * np.arange(8)[:, None] - 0.2
        got = run_tile(s, tile_cap=64, k_chunk=32)
        want = run_oracle(s)
        np.testing.assert_allclose(np.asarray(got.color), want["color"],
                                   atol=1e-5, rtol=1e-4)
