"""Bisect the blend cost: build the chunk math up incrementally (dev tool)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n * 1000)
    print(f"{name:46s} {min(ts):9.2f} ms  (runs: "
          + ", ".join(f"{t:.2f}" for t in ts) + ")", flush=True)


T, CAP, P, N, K = 2500, 1024, 256, 100_000, 128
NCH = CAP // K
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (T, CAP)).astype(np.int32))
means2d = jnp.asarray(rng.rand(N, 2).astype(np.float32) * 800)
conics = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 0.01)
rgb = jnp.asarray(rng.rand(N, 3).astype(np.float32))
opacity = jnp.asarray(rng.rand(N).astype(np.float32) * 0.5)
depths = jnp.asarray(rng.rand(N).astype(np.float32) * 5)

tile_ids = jnp.arange(T, dtype=jnp.int32)
l = jnp.arange(16, dtype=jnp.int32)
px = ((tile_ids % 50) * 16)[:, None, None] + l[None, None, :]
py = ((tile_ids // 50) * 16)[:, None, None] + l[None, :, None]
px = jnp.broadcast_to(px, (T, 16, 16)).reshape(T, P).astype(jnp.float32)
py = jnp.broadcast_to(py, (T, 16, 16)).reshape(T, P).astype(jnp.float32)


def scan_over_chunks(per_chunk):
    def run(m2d, con, rg, op, dep):
        safe = jnp.maximum(idx, 0)

        def body(carry, c):
            sl = jax.lax.dynamic_slice_in_dim(safe, c * K, K, axis=1)
            out = per_chunk(carry, sl, m2d, con, rg, op, dep)
            return out

        acc, _ = jax.lax.scan(body, jnp.zeros((T, P)), jnp.arange(NCH))
        return acc.sum()
    return jax.jit(run)


# 1: gathers only
def c_gather(acc, sl, m2d, con, rg, op, dep):
    s = (m2d[sl, 0] + m2d[sl, 1] + con[sl, 0] + con[sl, 1] + con[sl, 2]
         + op[sl] + dep[sl] + rg[sl].sum(-1))
    return acc + s[:, :1] * 0 + s.sum(1, keepdims=True), None
timeit("1 gathers only", scan_over_chunks(c_gather),
       means2d, conics, rgb, opacity, depths)


# 2: + alpha math
def c_alpha(acc, sl, m2d, con, rg, op, dep):
    dx = m2d[sl, 0][..., :, None] - px[..., None, :]
    dy = m2d[sl, 1][..., :, None] - py[..., None, :]
    power = (-0.5 * (con[sl, 0][..., :, None] * dx * dx
                     + con[sl, 2][..., :, None] * dy * dy)
             - con[sl, 1][..., :, None] * dx * dy)
    a = jnp.minimum(0.99, op[sl][..., :, None] * jnp.exp(power))
    a = jnp.where((power > 0) | (a < 1 / 255.), 0.0, a)
    return acc + a.sum(-2), None
timeit("2 gathers+alpha", scan_over_chunks(c_alpha),
       means2d, conics, rgb, opacity, depths)


# 3: + cumprod transmittance
def c_cum(acc, sl, m2d, con, rg, op, dep):
    dx = m2d[sl, 0][..., :, None] - px[..., None, :]
    dy = m2d[sl, 1][..., :, None] - py[..., None, :]
    power = (-0.5 * (con[sl, 0][..., :, None] * dx * dx
                     + con[sl, 2][..., :, None] * dy * dy)
             - con[sl, 1][..., :, None] * dx * dy)
    a = jnp.minimum(0.99, op[sl][..., :, None] * jnp.exp(power))
    a = jnp.where((power > 0) | (a < 1 / 255.), 0.0, a)
    one_m = 1 - a
    t_full = jnp.cumprod(one_m, axis=-2)
    return acc + (a * t_full).sum(-2), None
timeit("3 +cumprod", scan_over_chunks(c_cum),
       means2d, conics, rgb, opacity, depths)


# 4: + trig/done bookkeeping
def c_trig(acc, sl, m2d, con, rg, op, dep):
    dx = m2d[sl, 0][..., :, None] - px[..., None, :]
    dy = m2d[sl, 1][..., :, None] - py[..., None, :]
    power = (-0.5 * (con[sl, 0][..., :, None] * dx * dx
                     + con[sl, 2][..., :, None] * dy * dy)
             - con[sl, 1][..., :, None] * dx * dy)
    a = jnp.minimum(0.99, op[sl][..., :, None] * jnp.exp(power))
    a = jnp.where((power > 0) | (a < 1 / 255.), 0.0, a)
    one_m = 1 - a
    t_full = jnp.cumprod(one_m, axis=-2)
    trig = (t_full * one_m < 1e-4) & (a > 0)
    done = jnp.cumsum(trig.astype(jnp.int32), axis=-2) > 0
    w = a * t_full * (~done)
    return acc + w.sum(-2), None
timeit("4 +trig/done", scan_over_chunks(c_trig),
       means2d, conics, rgb, opacity, depths)


# 5: + color einsum + depth
def c_full(acc, sl, m2d, con, rg, op, dep):
    dx = m2d[sl, 0][..., :, None] - px[..., None, :]
    dy = m2d[sl, 1][..., :, None] - py[..., None, :]
    power = (-0.5 * (con[sl, 0][..., :, None] * dx * dx
                     + con[sl, 2][..., :, None] * dy * dy)
             - con[sl, 1][..., :, None] * dx * dy)
    a = jnp.minimum(0.99, op[sl][..., :, None] * jnp.exp(power))
    a = jnp.where((power > 0) | (a < 1 / 255.), 0.0, a)
    one_m = 1 - a
    t_full = jnp.cumprod(one_m, axis=-2)
    trig = (t_full * one_m < 1e-4) & (a > 0)
    done = jnp.cumsum(trig.astype(jnp.int32), axis=-2) > 0
    w = a * t_full * (~done)
    color = jnp.einsum("tkp,tkc->tpc", w, rg[sl])
    dep_acc = (w * dep[sl][..., :, None]).sum(-2)
    return acc + color.sum(-1) + dep_acc, None
timeit("5 full chunk", scan_over_chunks(c_full),
       means2d, conics, rgb, opacity, depths)

# 6: real blend_tiles for reference
from splatfields_tpu.ops.raster.blend_jax import blend_tiles
timeit("6 blend_tiles", jax.jit(
    lambda m, c, r, o, d: blend_tiles(idx, m, c, r, o, d, 50, 50, 16,
                                      k_chunk=128).color.sum()),
    means2d, conics, rgb, opacity, depths)
