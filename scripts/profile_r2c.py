"""In-program-loop stage profiler: each stage runs ITERS times inside ONE
jitted program (lax.fori_loop with a varying per-iteration epsilon), so the
measurement amortizes the axon relay's per-call RPC latency AND defeats its
(program, args) execution cache. This is the trustworthy way to time
sub-10ms stages here; one-call-per-iteration timers (profile_r2b) showed
up to 4x jitter from relay round-trips."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu.ops.grid_sample import grid_sample_2d
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import pack_attributes
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.utils import camera_math as cm

ITERS = 20


def timeit(name, step_fn, *args):
    """step_fn(eps, *args) -> array/pytree; looped ITERS times in-program."""

    def program(*a):
        def body(i, acc):
            out = step_fn(acc * 1e-20 + jnp.float32(i) * 1e-12, *a)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                             for l in leaves)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    prog = jax.jit(program)
    jax.block_until_ready(prog(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(prog(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


def main():
    import math
    width = height = 800
    n = 100_000
    rng = np.random.RandomState(0)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 4.0], np.float32)
    w2v = jnp.asarray(cm.get_world2view(R, t).T)
    fov = 0.8
    proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
    full = jnp.asarray((np.asarray(w2v) @ proj).astype(np.float32))
    tanfov = math.tan(fov / 2)

    means = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
    scales = jnp.asarray((0.005 + 0.01 * rng.rand(n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    ops = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    cols = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    tiles_x = tiles_y = 50

    pre = preprocess(means, scales, rots, ops, w2v, full, width, height,
                     tanfov, tanfov, colors_precomp=cols)
    dup_cap = 5 * n

    timeit("preprocess fwd", lambda e, m: preprocess(
        m + e, scales, rots, ops, w2v, full, width, height, tanfov, tanfov,
        colors_precomp=cols), means)
    timeit("preprocess fwd+bwd", lambda e, m: jax.grad(
        lambda mm: preprocess(mm + e, scales, rots, ops, w2v, full, width,
                              height, tanfov, tanfov,
                              colors_precomp=cols).means2d.sum())(m), means)

    timeit("binning (pallas path, 5N)", lambda e, m: bin_gaussians(
        m + e, pre.depths, pre.radii, tiles_x, tiles_y, 16, tile_cap=1024,
        dup_cap=dup_cap, build_table=False), pre.means2d)
    timeit("binning (pallas path, 8N)", lambda e, m: bin_gaussians(
        m + e, pre.depths, pre.radii, tiles_x, tiles_y, 16, tile_cap=1024,
        build_table=False), pre.means2d)

    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, tiles_x,
                            tiles_y, 16, tile_cap=1024, dup_cap=dup_cap,
                            build_table=False)
    timeit("sorted_pack row gather [5N,10]", lambda e, m: pack_attributes(
        m + e, pre.conics, pre.rgb, pre.opacity, pre.depths)[
        jnp.maximum(binning.sorted_id, 0)], pre.means2d)

    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]
    bl = lambda s: blend_sorted_pallas(s, binning.tile_start, binning.counts,
                                       tiles_x, tiles_y, 16, 1024, 128)
    timeit("pallas blend fwd", lambda e, s: bl(s + e)[0], sp)
    timeit("pallas blend fwd+bwd", lambda e, s: jax.grad(
        lambda ss: sum(x.sum() for x in bl(ss + e)))(s), sp)

    # grid_sample variants (3 planes, 16x160x160, 100k pts)
    planes = jnp.asarray(rng.randn(3, 16, 160, 160).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    axes = [(0, 1), (0, 2), (1, 2)]

    def gs_fwd(e, pl):
        feats = [grid_sample_2d(pl[i], pts[:, list(ax)] + e)
                 for i, ax in enumerate(axes)]
        return jnp.concatenate(feats, axis=1)

    def gs_rows(e, pl):
        outs = []
        for i, ax in enumerate(axes):
            rows = pl[i].reshape(16, -1).T
            c = pts[:, list(ax)] + e
            x = ((c[:, 0] + 1) * 160 - 1) / 2
            y = ((c[:, 1] + 1) * 160 - 1) / 2
            x0 = jnp.floor(x); y0 = jnp.floor(y)
            wx1 = (x - x0)[:, None]; wy1 = (y - y0)[:, None]
            x0i = jnp.clip(x0, 0, 159).astype(jnp.int32)
            x1i = jnp.clip(x0 + 1, 0, 159).astype(jnp.int32)
            y0i = jnp.clip(y0, 0, 159).astype(jnp.int32)
            y1i = jnp.clip(y0 + 1, 0, 159).astype(jnp.int32)
            v00 = rows[y0i * 160 + x0i]
            v01 = rows[y0i * 160 + x1i]
            v10 = rows[y1i * 160 + x0i]
            v11 = rows[y1i * 160 + x1i]
            outs.append(v00 * (1 - wx1) * (1 - wy1) + v01 * wx1 * (1 - wy1)
                        + v10 * (1 - wx1) * wy1 + v11 * wx1 * wy1)
        return jnp.concatenate(outs, axis=1)

    timeit("grid_sample x3 fwd (advanced idx)", gs_fwd, planes)
    timeit("grid_sample x3 fwd+bwd", lambda e, pl: jax.grad(
        lambda q: gs_fwd(e, q).sum())(pl), planes)
    timeit("grid_sample x3 fwd (row gather)", gs_rows, planes)
    timeit("grid_sample x3 row fwd+bwd", lambda e, pl: jax.grad(
        lambda q: gs_rows(e, q).sum())(pl), planes)


if __name__ == "__main__":
    main()
