"""Probe 2: primitive costs for a sorted segment-sum NGP table gradient.

At bench scale the hash-table VJP is ONE scatter-add of 12.8M updates
(~1.02 s measured, ~80 ns/update — XLA TPU scatters serialize). The only
exact alternatives run through a sort. Measure the building blocks at
12.8M rows so the design choice is evidence-based:

  a) full scatter-add 12.8M -> [16.8M, 2]      (the baseline)
  b) sort 12.8M int32 keys + 2 f32 payloads     (jax.lax.sort, 3-op)
  c) cumsum over the sorted [12.8M, 2]
  d) boundary-compact + scatter of unique rows  (the sorted finisher)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

M = 12_800_000
R = 16 * (2 ** 20)


def timed(fn, args_fn, n=3, label=""):
    out = fn(*args_fn(0))
    _ = float(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*args_fn(i))
    _ = float(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    idx0 = jnp.asarray(rng.randint(0, R, M).astype(np.int32))
    upd = jnp.asarray(rng.randn(M, 2).astype(np.float32))

    @jax.jit
    def full_scatter(idx, upd):
        tbl = jnp.zeros((R, 2), jnp.float32)
        tbl = tbl.at[idx].add(upd)
        return jnp.sum(tbl[:128] ** 2)

    @jax.jit
    def sort3(idx, upd):
        si, s0, s1 = jax.lax.sort((idx, upd[:, 0], upd[:, 1]), num_keys=1)
        return si[0] + jnp.sum(s0[:8]) + jnp.sum(s1[:8])

    @jax.jit
    def sort_cumsum(idx, upd):
        si, s0, s1 = jax.lax.sort((idx, upd[:, 0], upd[:, 1]), num_keys=1)
        cs0 = jnp.cumsum(s0)
        cs1 = jnp.cumsum(s1)
        return si[0] + cs0[-1] + cs1[-1]

    def args(i):
        # fresh values each call (relay caches identical (prog, args))
        return (idx0 + i, upd * (1.0 + 1e-4 * i))

    timed(full_scatter, args, label="a) full scatter-add 12.8M")
    timed(sort3, args, label="b) sort 12.8M (1 key + 2 payload)")
    timed(sort_cumsum, args, label="b+c) sort + cumsum 12.8M")


if __name__ == "__main__":
    main()
