"""Find the blend slowdown: variants of blend_tiles on TPU (dev tool)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.ops.raster.blend_jax import blend_tiles, _blend_chunk


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return out


T, CAP, P, N = 2500, 1024, 256, 100_000
K = 128
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (T, CAP)).astype(np.int32))
means2d = jnp.asarray(rng.rand(N, 2).astype(np.float32) * 800)
conics = jnp.asarray(rng.rand(N, 3).astype(np.float32))
rgb = jnp.asarray(rng.rand(N, 3).astype(np.float32))
opacity = jnp.asarray(rng.rand(N).astype(np.float32) * 0.5)
depths = jnp.asarray(rng.rand(N).astype(np.float32) * 5)

f = jax.jit(lambda *a: blend_tiles(*a, 50, 50, 16, k_chunk=128).color.sum())
timeit("blend_tiles as-is (args)", f, idx, means2d, conics, rgb, opacity,
       depths)

f256 = jax.jit(lambda *a: blend_tiles(*a, 50, 50, 16, k_chunk=256).color.sum())
timeit("blend_tiles k_chunk=256", f256, idx, means2d, conics, rgb, opacity,
       depths)


# hoisted-gather variant: gather [T, CAP] attrs once, scan over chunks
def blend_hoisted(idx, means2d, conics, rgb, opacity, depths):
    safe = jnp.maximum(idx, 0)
    valid = idx >= 0
    g = {
        "mean_x": means2d[safe, 0], "mean_y": means2d[safe, 1],
        "con_a": conics[safe, 0], "con_b": conics[safe, 1],
        "con_c": conics[safe, 2], "opacity": opacity[safe],
        "rgb": rgb[safe], "depth": depths[safe], "valid": valid,
    }
    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tile_ids % 50) * 16
    ty0 = (tile_ids // 50) * 16
    l = jnp.arange(16, dtype=jnp.int32)
    px = (tx0[:, None, None] + l[None, None, :]).astype(jnp.float32)
    py = (ty0[:, None, None] + l[None, :, None]).astype(jnp.float32)
    px = jnp.broadcast_to(px, (T, 16, 16)).reshape(T, P)
    py = jnp.broadcast_to(py, (T, 16, 16)).reshape(T, P)

    def chunk(c):
        d = {k: jax.lax.dynamic_slice_in_dim(v, c * K, K, axis=1)
             for k, v in g.items()}
        d["px"], d["py"] = px, py
        return d

    color0 = jnp.zeros((T, P, 3), jnp.float32)
    depth0 = jnp.zeros((T, P), jnp.float32)
    t0 = jnp.ones((T, P), jnp.float32)
    done0 = jnp.zeros((T, P), bool)

    def body(carry, c):
        return _blend_chunk(carry, chunk(c))

    (color, depth, trans, _), _ = jax.lax.scan(
        body, (color0, depth0, t0, done0), jnp.arange(CAP // K))
    return color.sum()

timeit("blend hoisted gathers, no remat",
       jax.jit(blend_hoisted), idx, means2d, conics, rgb, opacity, depths)


# variant: in-scan gathers but no remat
def blend_noremat(idx, means2d, conics, rgb, opacity, depths):
    safe = jnp.maximum(idx, 0)
    valid = idx >= 0
    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tile_ids % 50) * 16
    ty0 = (tile_ids // 50) * 16
    l = jnp.arange(16, dtype=jnp.int32)
    px = (tx0[:, None, None] + l[None, None, :]).astype(jnp.float32)
    py = (ty0[:, None, None] + l[None, :, None]).astype(jnp.float32)
    px = jnp.broadcast_to(px, (T, 16, 16)).reshape(T, P)
    py = jnp.broadcast_to(py, (T, 16, 16)).reshape(T, P)

    def chunk(c):
        sl = jax.lax.dynamic_slice_in_dim(safe, c * K, K, axis=1)
        v = jax.lax.dynamic_slice_in_dim(valid, c * K, K, axis=1)
        return {
            "mean_x": means2d[sl, 0], "mean_y": means2d[sl, 1],
            "con_a": conics[sl, 0], "con_b": conics[sl, 1],
            "con_c": conics[sl, 2], "opacity": opacity[sl],
            "rgb": rgb[sl], "depth": depths[sl], "valid": v,
            "px": px, "py": py,
        }

    color0 = jnp.zeros((T, P, 3), jnp.float32)
    depth0 = jnp.zeros((T, P), jnp.float32)
    t0 = jnp.ones((T, P), jnp.float32)
    done0 = jnp.zeros((T, P), bool)

    def body(carry, c):
        return _blend_chunk(carry, chunk(c))

    (color, depth, trans, _), _ = jax.lax.scan(
        body, (color0, depth0, t0, done0), jnp.arange(CAP // K))
    return color.sum()

timeit("blend in-scan gathers, no remat",
       jax.jit(blend_noremat), idx, means2d, conics, rgb, opacity, depths)

# gradient through hoisted variant
timeit("blend hoisted fwd+bwd(means2d)",
       jax.jit(jax.grad(lambda m: blend_hoisted(
           idx, m, conics, rgb, opacity, depths))), means2d)
