"""Round-2 micro-profiles: binning (pallas path), grid_sample fwd/bwd and
candidate reformulations, pallas blend fwd vs fwd+bwd. Cache-defeating
(varying eps threaded through every timed call)."""
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


def timeit(name, fn, *args, n=10):
    out = fn(1e-12, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(float(i + 1) * 1e-12, *args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return out


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

    # ---- binning: pallas path (no dense table) vs table path
    for bt in (False, True):
        timeit(f"binning build_table={bt}", jax.jit(
            lambda e, m: bin_gaussians(m + e, pre.depths, pre.radii,
                                       tiles_x, tiles_y, 16, tile_cap=1024,
                                       build_table=bt),
            static_argnums=()), pre.means2d)

    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, tiles_x,
                            tiles_y, 16, tile_cap=1024, build_table=False)

    # ---- sorted-pack gather alone
    timeit("sorted_pack row gather [800k,10]", jax.jit(
        lambda e, m: pack_attributes(m + e, pre.conics, pre.rgb,
                                     pre.opacity, pre.depths)[
            jnp.maximum(binning.sorted_id, 0)]), pre.means2d)

    # ---- pallas blend fwd / fwd+bwd
    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]
    bl = lambda s: blend_sorted_pallas(s, binning.tile_start, binning.counts,
                                       tiles_x, tiles_y, 16, 1024, 128)
    timeit("pallas blend fwd", jax.jit(
        lambda e, s: bl(s + e)[0].sum()), sp)
    timeit("pallas blend fwd+bwd", jax.jit(jax.grad(
        lambda s, e: sum(x.sum() for x in bl(s + e)), argnums=0)),
        *(sp,), n=10)

    # ---- preprocess fwd+bwd
    timeit("preprocess fwd+bwd", jax.jit(jax.grad(
        lambda m, e: preprocess(
            m + e, scales, rots, ops, w2v, full, width, height, tanfov,
            tanfov, colors_precomp=cols).means2d.sum(), argnums=0)), means)

    # ---- grid_sample current formulation (3 planes, 16x160x160)
    planes = jnp.asarray(rng.randn(3, 16, 160, 160).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    axes = [(0, 1), (0, 2), (1, 2)]

    def gs_fwd(e, pl):
        feats = [grid_sample_2d(pl[i], pts[:, list(ax)] + e)
                 for i, ax in enumerate(axes)]
        return jnp.concatenate(feats, axis=1)

    timeit("grid_sample x3 fwd (advanced idx)", jax.jit(gs_fwd), planes)
    _g_adv = jax.jit(jax.grad(lambda pl, e: gs_fwd(e, pl).sum(), argnums=0))
    timeit("grid_sample x3 fwd+bwd(planes)",
           lambda e, pl: _g_adv(pl, e), planes)

    # ---- row-gather reformulation fwd
    def gs_rows(e, pl):
        outs = []
        for i, ax in enumerate(axes):
            rows = pl[i].reshape(16, -1).T  # [H*W, C]
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

    timeit("grid_sample x3 fwd (row gather)", jax.jit(gs_rows), planes)
    _g_rows = jax.jit(jax.grad(lambda pl, e: gs_rows(e, pl).sum(),
                               argnums=0))
    timeit("grid_sample x3 row fwd+bwd(planes)",
           lambda e, pl: _g_rows(pl, e), planes)

    # ---- matmul(one-hot) backward candidate: grad wrt plane via
    #      per-axis one-hot matmuls (scatter-free)
    def onehot_bwd(e, g):
        # g: [N, 16] cotangent for ONE plane; coords pts[:, (0,1)]
        c = pts[:, :2] + e
        x = ((c[:, 0] + 1) * 160 - 1) / 2
        y = ((c[:, 1] + 1) * 160 - 1) / 2
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx1 = x - x0; wy1 = y - y0
        ar = jnp.arange(160, dtype=jnp.float32)
        OX = (jnp.clip(x0, 0, 159)[:, None] == ar) * (1 - wx1)[:, None] + \
             (jnp.clip(x0 + 1, 0, 159)[:, None] == ar) * wx1[:, None]
        OY = (jnp.clip(y0, 0, 159)[:, None] == ar) * (1 - wy1)[:, None] + \
             (jnp.clip(y0 + 1, 0, 159)[:, None] == ar) * wy1[:, None]
        # [C*Y, N] @ [N, X] in one shot via (OY ⊗ g) chunks
        OYg = OY[:, :, None] * g[:, None, :]          # [N, Y, C]
        return jnp.einsum("nyc,nx->cyx", OYg, OX,
                          preferred_element_type=jnp.float32)

    g1 = jnp.asarray(rng.rand(n, 16).astype(np.float32))
    timeit("one-hot matmul plane bwd (1 plane)", jax.jit(onehot_bwd), g1)


if __name__ == "__main__":
    main()
