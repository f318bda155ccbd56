"""Field-net decomposition + ssim + blend k_chunk sweep (in-program loop)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu.models.splatfields import SplatFields
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import pack_attributes
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.ops.ssim import ssim as ssim_fn
from splatfields_tpu.utils import camera_math as cm

ITERS = 20


def timeit(name, step_fn, *args):
    # NOTE: the relay caches (program, args) executions — the cache-defeating
    # seed must be an ARGUMENT of the outer jitted call, not loop-internal.
    def program(seed, *a):
        def body(i, acc):
            out = step_fn(acc * 1e-20 + seed + jnp.float32(i) * 1e-12, *a)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                             for l in leaves)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    prog = jax.jit(program)
    jax.block_until_ready(prog(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    jax.block_until_ready(prog(jnp.float32(1e-9), *args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


def main():
    import math
    n = 100_000
    rng = np.random.RandomState(0)
    means = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))

    # full field net
    net = SplatFields(n_frames=0, radius=1.0,
                      encoder_type="VarTriPlaneEncoder", composition_rank=0)
    fv = net.init(jax.random.PRNGKey(0), means)

    timeit("field full fwd", lambda e, v, x: net.apply(v, x + e), fv, means)
    timeit("field full fwd+bwd", lambda e, v, x: jax.grad(
        lambda p: net.apply(dict(v, params=p), x + e)["means3D"].sum())(
            v["params"]), fv, means)

    # CNN plane generation alone
    timeit("plane CNN fwd", lambda e, v: net.apply(
        jax.tree.map(lambda a: a + e, v), None,
        method=SplatFields.generate_planes), fv)
    timeit("plane CNN fwd+bwd", lambda e, v: jax.grad(
        lambda p: net.apply(dict(v, params=jax.tree.map(lambda a: a + e, p)),
                            None,
                            method=SplatFields.generate_planes).sum())(
            v["params"]), fv)

    # encoder+refine (sampling + CNN + refine)
    timeit("extract_features fwd", lambda e, v, x: net.apply(
        v, x + e, None, None, method=SplatFields.extract_features), fv, means)
    timeit("extract_features fwd+bwd", lambda e, v, x: jax.grad(
        lambda p: net.apply(dict(v, params=p), x + e, None, None,
                            method=SplatFields.extract_features).sum())(
            v["params"]), fv, means)

    # pure-MLP ablation (no encoder): heads + embeddings only
    net2 = SplatFields(n_frames=0, radius=1.0, encoder_type="",
                       composition_rank=0)
    fv2 = net2.init(jax.random.PRNGKey(0), means)
    timeit("pure-MLP heads fwd+bwd", lambda e, v, x: jax.grad(
        lambda p: net2.apply(dict(v, params=p), x + e)["means3D"].sum())(
            v["params"]), fv2, means)

    # ssim
    gt = jnp.asarray(rng.rand(3, 800, 800).astype(np.float32))
    timeit("ssim fwd", lambda e, a: ssim_fn(a + e, gt), gt * 0.5)
    timeit("ssim fwd+bwd", lambda e, a: jax.grad(
        lambda x: 1 - ssim_fn(x + e, gt))(a), gt * 0.5)

    # blend k_chunk sweep
    width = height = 800
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 4.0], np.float32)
    w2v = jnp.asarray(cm.get_world2view(R, t).T)
    fov = 0.8
    proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
    full = jnp.asarray((np.asarray(w2v) @ proj).astype(np.float32))
    tanfov = math.tan(fov / 2)
    scales = jnp.asarray((0.005 + 0.01 * rng.rand(n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    ops = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    cols = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    pre = preprocess(means, scales, rots, ops, w2v, full, width, height,
                     tanfov, tanfov, colors_precomp=cols)
    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, 50, 50, 16,
                            tile_cap=1024, dup_cap=5 * n, build_table=False)
    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]
    for k in (64, 128, 256):
        bl = lambda s: blend_sorted_pallas(
            s, binning.tile_start, binning.counts, 50, 50, 16, 1024, k)
        timeit(f"blend fwd+bwd k={k}", lambda e, s: jax.grad(
            lambda ss: sum(x.sum() for x in bl(ss + e)))(s), sp)


if __name__ == "__main__":
    main()
