"""Blend kernel dissection: per-grid-step overhead vs real work.

- counts=0 run: pure dispatch/DMA-setup cost of 2500 grid steps.
- k_chunk sweep under the sound harness.
- fwd vs fwd+bwd split.
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

from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import pack_attributes
from splatfields_tpu.ops.raster.blend_pallas import blend_sorted_pallas
from splatfields_tpu.ops.raster.preprocess import preprocess
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
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


def main():
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
    pre = preprocess(means, scales, rots, ops, w2v, full, 800, 800,
                     tanfov, tanfov, colors_precomp=cols)
    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, tiles,
                            tiles, 16, tile_cap=1024, dup_cap=5 * n,
                            build_table=False)
    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]
    zero_counts = jnp.zeros_like(binning.counts)
    total = int(jax.device_get(jnp.sum(
        jnp.minimum(binning.counts, 1024))))
    print(f"# instances in tiles: {total}", flush=True)

    def blend(s, counts, k):
        return blend_sorted_pallas(s, binning.tile_start, counts,
                                   tiles, tiles, 16, 1024, k)

    timeit("blend fwd counts=0 (pure dispatch)",
           lambda s: blend(s, zero_counts, 128), sp)
    for k in (128, 256):
        timeit(f"blend fwd k={k}", lambda s, k=k: blend(
            s, binning.counts, k), sp)
        timeit(f"blend fwd+bwd k={k}", lambda s, k=k: jax.value_and_grad(
            lambda ss: sum(jnp.sum(jnp.tanh(x))
                           for x in blend(ss, binning.counts, k)))(s), sp)


if __name__ == "__main__":
    main()
