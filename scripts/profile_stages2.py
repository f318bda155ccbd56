"""Stage budget with the SOUND timing harness (CLAUDE.md pitfalls 1-3):
float() sync, warmup/timed args differ, multiplicative index perturbation.

Stages at bench shape (100k splats, 800x800, dup=5N, tile_cap 1024, k=128):
preprocess, binning, sorted-pack gather, blend fwd / fwd+bwd, field net
(encoder+heads) fwd / fwd+bwd, splat adam, field adam, ssim.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu import config as cfg_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.splatfields import SplatFields
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import pack_attributes
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.ops.ssim import ssim as ssim_fn
from splatfields_tpu.utils import camera_math as cm

ITERS = 20


def timeit(name, step_fn, x0, *args):
    def program(x, *a):
        def body(i, carry):
            acc, s = carry
            out = step_fn(x * (1.0 + s * 1e-22 + jnp.float32(i) * 1e-20),
                          *a)
            leaves = [l for l in jax.tree.leaves(out) if l is not None]
            tot = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30 for l in leaves)
            return acc + tot, tot
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.float32(0), jnp.float32(0)))[0]

    prog = jax.jit(program)
    float(prog(x0, *args))
    t0 = time.perf_counter()
    float(prog(x0 * (1.0 + 1e-7), *args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:42s} {dt:9.2f} ms", flush=True)


def main():
    width = height = 800
    n = 100_000
    tiles = 50
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
    dup = 5 * n

    def run_pre(m):
        return preprocess(m, scales, rots, ops, w2v, full, width, height,
                          tanfov, tanfov, colors_precomp=cols)

    timeit("preprocess fwd", lambda m: run_pre(m), means)
    timeit("preprocess fwd+bwd", lambda m: jax.value_and_grad(
        lambda mm: jnp.sum(jnp.tanh(run_pre(mm).conics)))(m), means)

    pre = run_pre(means)

    timeit("binning (sort+dup)", lambda m: bin_gaussians(
        m[:, :2] * 400 + 400, pre.depths, pre.radii, tiles, tiles, 16,
        tile_cap=1024, dup_cap=dup, build_table=False), means)

    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, tiles,
                            tiles, 16, tile_cap=1024, dup_cap=dup,
                            build_table=False)
    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)

    # sorted-pack gather alone (indexes vary with the perturbed pack? no —
    # perturb the GATHER source is linear; instead perturb sorted_id order
    # is fixed... approximate: gather cost shows inside blend fwd below)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]

    def blend(s):
        return blend_sorted_pallas(s, binning.tile_start, binning.counts,
                                   tiles, tiles, 16, 1024, 128)

    timeit("blend fwd (pallas)", lambda s: blend(s), sp)
    timeit("blend fwd+bwd (pallas)", lambda s: jax.value_and_grad(
        lambda ss: sum(jnp.sum(jnp.tanh(x)) for x in blend(ss)))(s), sp)

    # full field net (encoder + heads), bench config
    net = SplatFields(n_frames=0, radius=1.0,
                      encoder_type="VarTriPlaneEncoder", composition_rank=0)
    fv = net.init(jax.random.PRNGKey(0), means)

    timeit("field fwd (enc+heads)", lambda x, v: net.apply(v, x), means, fv)
    timeit("field fwd+bwd", lambda x, v: jax.value_and_grad(
        lambda p: sum(jnp.sum(jnp.tanh(o))
                      for o in net.apply(dict(v, params=p), x).values()
                      if o is not None))(v["params"]), means, fv)

    # CNN plane decode alone (perturb via params — multiplicative)
    timeit("plane CNN fwd", lambda x, v: net.apply(
        jax.tree.map(lambda a: a * (1 + jnp.sum(x) * 1e-30), v), None,
        method=SplatFields.generate_planes), means, fv)
    timeit("plane CNN fwd+bwd", lambda x, v: jax.value_and_grad(
        lambda p: jnp.sum(jnp.tanh(net.apply(
            dict(v, params=jax.tree.map(
                lambda a: a * (1 + jnp.sum(x) * 1e-30), p)), None,
            method=SplatFields.generate_planes))))(v["params"]), means, fv)

    # adams
    params, stats = splats_lib.create_from_pcd(
        np.asarray(means), np.asarray(cols), 0, capacity=n)
    sopt = splats_lib.adam_init(params)
    lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
    g_sp = jax.tree.map(jnp.ones_like, params)

    # perturb the GRADIENT (adam is affine in params — a param perturbation
    # would distribute out of the loop; nu += g^2 is nonlinear in g)
    timeit("splat adam", lambda x, p, g, o: splats_lib.adam_update(
        p, jax.tree.map(lambda a: a * (1 + jnp.sum(x) * 1e-30), g), o, lrs),
        means, params, g_sp, sopt)

    fopt = splats_lib.adam_init(fv["params"])
    g_fp = jax.tree.map(jnp.ones_like, fv["params"])
    timeit("field adam", lambda x, p, g, o: splats_lib.adam_update(
        p, jax.tree.map(lambda a: a * (1 + jnp.sum(x) * 1e-30), g), o,
        jnp.asarray(1e-3, jnp.float32)),
        means, fv["params"], g_fp, fopt)

    gt = jnp.asarray(rng.rand(3, 800, 800).astype(np.float32))
    timeit("ssim fwd+bwd", lambda x: jax.value_and_grad(
        lambda a: 1 - ssim_fn(jnp.tanh(a), gt))(x[:, :1].sum() * 1e-20 + gt * 0.5),
        jnp.asarray(rng.rand(3, 800, 800).astype(np.float32)))


if __name__ == "__main__":
    main()
