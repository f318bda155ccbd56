"""Micro-benchmarks for blend/binning primitives on TPU (dev tool)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return out


T, K, P, N = 2500, 128, 256, 100_000
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (T, 1024)).astype(np.int32))
attr = jnp.asarray(rng.rand(N).astype(np.float32))
attr3 = jnp.asarray(rng.rand(N, 3).astype(np.float32))
px = jnp.asarray(rng.rand(T, P).astype(np.float32) * 800)

# 1. pure gather cost: [T, 1024] from [N]
timeit("gather [T,1024] x 10 attrs",
       jax.jit(lambda i: sum(attr[i] for _ in range(10)).sum()), idx)

# 2. alpha math for one chunk (no gather): [T,K,P]
mx = jnp.asarray(rng.rand(T, K).astype(np.float32) * 800)
ca = jnp.asarray(rng.rand(T, K).astype(np.float32))

def alpha_math(mx, ca, px):
    dx = mx[..., :, None] - px[..., None, :]
    power = -0.5 * ca[..., :, None] * dx * dx - 0.1 * dx
    a = jnp.minimum(0.99, jnp.exp(power))
    a = jnp.where((power > 0) | (a < 1/255.), 0.0, a)
    return a
timeit("alpha math [T,K,P] (one chunk)",
       jax.jit(lambda *a: alpha_math(*a).sum()), mx, ca, px)

# 3. cumprod along K
a = jnp.asarray(rng.rand(T, K, P).astype(np.float32))
timeit("cumprod [T,K,P] axis K",
       jax.jit(lambda x: jnp.cumprod(x, axis=-2).sum()), a)
timeit("cumsum-log trick [T,K,P]",
       jax.jit(lambda x: jnp.exp(jnp.cumsum(jnp.log(x), axis=-2)).sum()), a)
timeit("cumsum [T,K,P] axis K",
       jax.jit(lambda x: jnp.cumsum(x, axis=-2).sum()), a)

# 4. weighted color einsum
rgbk = jnp.asarray(rng.rand(T, K, 3).astype(np.float32))
timeit("einsum tkp,tkc->tpc",
       jax.jit(lambda w, c: jnp.einsum("tkp,tkc->tpc", w, c).sum()), a, rgbk)

# 5. full 8-chunk scan of alpha math + cumprod
def full(mx8, ca8, px):
    def body(carry, xs):
        m, c = xs
        al = alpha_math(m, c, px)
        t = carry * jnp.cumprod(1 - al, axis=-2)[:, -1]
        return t, al.sum()
    t, s = jax.lax.scan(body, jnp.ones((T, P)), (mx8, ca8))
    return t.sum() + s.sum()
mx8 = jnp.asarray(rng.rand(8, T, K).astype(np.float32))
ca8 = jnp.asarray(rng.rand(8, T, K).astype(np.float32))
timeit("8-chunk scan alpha+cumprod", jax.jit(full), mx8, ca8, px)

# 6. sorts
keys = jnp.asarray(rng.randint(0, 2500, 800_000).astype(np.int32))
payload = jnp.asarray(rng.randint(0, N, 800_000).astype(np.int32))
timeit("lax.sort 800k key+payload",
       jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                         is_stable=True)[0].sum()),
       keys, payload)
keys4 = keys[:400_000]
pay4 = payload[:400_000]
timeit("lax.sort 400k key+payload",
       jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                         is_stable=True)[0].sum()),
       keys4, pay4)
f32keys = jnp.asarray(rng.rand(100_000).astype(np.float32))
timeit("argsort 100k f32",
       jax.jit(lambda k: jnp.argsort(k).sum()), f32keys)

# 7. searchsorted 800k over 100k
ends = jnp.asarray(np.sort(rng.randint(0, 800_000, N)).astype(np.int32))
d = jnp.arange(800_000, dtype=jnp.int32)
timeit("searchsorted 800k queries",
       jax.jit(lambda e: jnp.searchsorted(e, d, side='right').sum()), ends)
