"""Is the gather-backward (scatter-add) the bottleneck? (dev tool)"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return out


T, CAP, N = 2500, 1024, 100_000
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (T, CAP)).astype(np.int32))
x = jnp.asarray(rng.rand(N).astype(np.float32))
x2 = jnp.asarray(rng.rand(N, 2).astype(np.float32))

# forward gather
timeit("gather [T,CAP] fwd", jax.jit(lambda v: v[idx].sum()), x)
# gather + scatter-add backward
timeit("gather [T,CAP] fwd+bwd (scatter-add)",
       jax.jit(jax.grad(lambda v: (v[idx] * 2.0).sum())), x)
timeit("gather [T,CAP,2] fwd+bwd",
       jax.jit(jax.grad(lambda v: (v[idx] * 2.0).sum())), x2)

# segment-sum alternative: grads in sorted-by-id order
g_flat = jnp.asarray(rng.rand(T * CAP).astype(np.float32))
ids_sorted = jnp.sort(idx.reshape(-1))
timeit("segment_sum sorted ids",
       jax.jit(lambda g: jax.ops.segment_sum(
           g, ids_sorted, num_segments=N,
           indices_are_sorted=True).sum()), g_flat)
ids_unsorted = idx.reshape(-1)
timeit("segment_sum unsorted ids",
       jax.jit(lambda g: jax.ops.segment_sum(
           g, ids_unsorted, num_segments=N).sum()), g_flat)

# cumsum-difference reduction over contiguous ranges (the d-space design):
ends = jnp.asarray(np.sort(rng.randint(0, T * CAP, N)).astype(np.int32))
def range_sum(g):
    cs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(g)])
    return (cs[ends] - cs[jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])]).sum()
timeit("cumsum-difference range reduction", jax.jit(range_sum), g_flat)

# repeat-based expansion (binning g computation alternative)
counts = jnp.asarray(rng.multinomial(T * CAP, np.ones(N) / N).astype(np.int32))
timeit("jnp.repeat total_repeat_length",
       jax.jit(lambda c: jnp.repeat(
           jnp.arange(N, dtype=jnp.int32), c,
           total_repeat_length=T * CAP).sum()), counts)

# blend fwd again with more iters for reliable number
from splatfields_tpu.ops.raster.blend_jax import blend_tiles
means2d = jnp.asarray(rng.rand(N, 2).astype(np.float32) * 800)
conics = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 0.01)
rgb = jnp.asarray(rng.rand(N, 3).astype(np.float32))
opacity = jnp.asarray(rng.rand(N).astype(np.float32) * 0.5)
depths = jnp.asarray(rng.rand(N).astype(np.float32) * 5)
timeit("blend fwd (args, n=20)",
       jax.jit(lambda m: blend_tiles(m, means2d * 0 + m[:, :2].mean() if False else means2d, conics, rgb, opacity,
                                     depths, 50, 50, 16,
                                     k_chunk=128).color.sum()
               if False else
               blend_tiles(idx, m, conics, rgb, opacity, depths, 50, 50, 16,
                           k_chunk=128).color.sum()), means2d)
timeit("blend fwd+bwd(all attrs)",
       jax.jit(jax.grad(lambda m, c, r, o: blend_tiles(
           idx, m, c, r, o, depths, 50, 50, 16,
           k_chunk=128).color.sum(), argnums=(0, 1, 2, 3))),
       means2d, conics, rgb, opacity)
