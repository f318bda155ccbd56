"""Cache-defeating stage-by-stage TPU timing of the train step (dev tool).

Every timed function threads a varying scalar through its inputs so the
axon relay cannot serve a cached execution (CLAUDE.md: identical
(program, args) calls are memoized by the relay and report ~0.05 ms).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu import config as cfg_lib
from splatfields_tpu.models import splats as S
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.api import rasterize
from splatfields_tpu.ops.ssim import ssim as ssim_fn
from splatfields_tpu.utils import camera_math as cm


def timeit(name, fn, *args, n=10):
    """fn(eps, *args) must USE eps in a way that changes the output."""
    out = fn(1e-12, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(float(i + 1) * 1e-12, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
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
    campos = jnp.asarray(
        np.linalg.inv(np.asarray(w2v).T)[:3, 3].astype(np.float32))
    tanfov = math.tan(fov / 2)

    means = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
    scales = jnp.asarray((0.005 + 0.01 * rng.rand(n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    ops = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    cols = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    bg = jnp.ones(3, jnp.float32)
    gt = jnp.asarray(rng.rand(3, height, width).astype(np.float32))

    tiles_x = tiles_y = 50

    hidden = cfg_lib.HiddenConfig(encoder_type="VarTriPlaneEncoder",
                                  composition_rank=0, n_frames=0)
    deform = DeformModel(hidden, radius=1.0)
    net, fv = deform.net, deform.variables
    n_field_params = sum(x.size for x in jax.tree.leaves(fv["params"]))
    n_field_leaves = len(jax.tree.leaves(fv["params"]))
    print(f"field params: {n_field_params/1e6:.2f}M in "
          f"{n_field_leaves} leaves", flush=True)

    f_fwd = jax.jit(lambda e, v, x: net.apply(v, x + e)["means3D"].sum())
    timeit("field fwd", f_fwd, fv, means)
    f_fb = jax.jit(jax.grad(
        lambda v, e, x: net.apply(v, x + e)["means3D"].sum()), static_argnums=())
    timeit("field fwd+bwd(params)", lambda e, v, x: f_fb(v, e, x), fv, means)

    # encoder alone (plane CNN + sampling + refine)
    enc_fwd = jax.jit(lambda e, v, x: net.apply(
        v, x + e, None, None, method=type(net).extract_features).sum())
    timeit("encoder+refine fwd", enc_fwd, fv, means)

    pre_j = jax.jit(lambda e, m: preprocess(
        m + e, scales, rots, ops, w2v, full, width, height, tanfov, tanfov,
        colors_precomp=cols))
    pre = timeit("preprocess fwd", pre_j, means)

    bin_j = jax.jit(lambda e, m2d: bin_gaussians(
        m2d + e, pre.depths, pre.radii, tiles_x, tiles_y, 16,
        tile_cap=1024))
    binning = timeit("binning", bin_j, pre.means2d)
    print("   total dup:", int(jnp.sum(binning.counts)),
          "max/tile:", int(jnp.max(binning.counts)), flush=True)

    # adam updates
    pts_np = np.asarray(means)
    sp_params, sp_stats = S.create_from_pcd(pts_np, np.abs(pts_np), 0,
                                            capacity=n)
    sp_opt = S.adam_init(sp_params)
    lrs = S.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
    g_like = jax.tree.map(jnp.ones_like, sp_params)
    timeit("splat adam update", jax.jit(
        lambda e, p, g, o: S.adam_update(
            jax.tree.map(lambda a: a + e, p), g, o, lrs)[0].xyz.sum()),
        sp_params, g_like, sp_opt)
    f_grads = jax.tree.map(jnp.ones_like, fv["params"])
    f_opt = S.adam_init(fv["params"])
    timeit("field adam update", jax.jit(
        lambda e, p, g, o: jax.tree.leaves(S.adam_update(
            jax.tree.map(lambda a: a + e, p), g, o, 1e-3)[0])[0].sum()),
        fv["params"], f_grads, f_opt)

    rast = jax.jit(lambda e, m, s, q, o, c: rasterize(
        m + e, s, q, o, w2v, full, campos, bg, tanfov, tanfov, width, height,
        colors_precomp=c).color.sum())
    timeit("rasterize fwd", rast, means, scales, rots, ops, cols)
    rast_g = jax.jit(jax.grad(
        lambda m, e, s, q, o, c: rasterize(
            m + e, s, q, o, w2v, full, campos, bg, tanfov, tanfov, width,
            height, colors_precomp=c).color.sum(),
        argnums=(0, 2, 3, 4, 5)))
    timeit("rasterize fwd+bwd", lambda e, *a: rast_g(a[0], e, *a[1:]),
           means, scales, rots, ops, cols)

    def photo_loss(m, e, s, q, o, c):
        out = rasterize(m + e, s, q, o, w2v, full, campos, bg, tanfov,
                        tanfov, width, height, colors_precomp=c)
        l1 = jnp.mean(jnp.abs(out.color - gt))
        return 0.8 * l1 + 0.2 * (1 - ssim_fn(out.color, gt))
    ploss = jax.jit(jax.grad(photo_loss, argnums=(0, 2, 3, 4, 5)))
    timeit("raster+ssim loss fwd+bwd",
           lambda e, *a: ploss(a[0], e, *a[1:]),
           means, scales, rots, ops, cols)

    timeit("ssim only fwd", jax.jit(lambda e, a: ssim_fn(a + e, gt)),
           gt * 0.5)
    sg = jax.jit(jax.grad(lambda a, e: 1 - ssim_fn(a + e, gt)))
    timeit("ssim fwd+bwd", lambda e, a: sg(a, e), gt * 0.5)


if __name__ == "__main__":
    main()
