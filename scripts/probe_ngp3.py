"""Probe 3: does TPU scatter-add stop serializing when indices are
declared unique and/or sorted?

The sorted-segment pipeline (probe_ngp2: sort+cumsum = 67 ms vs 1016 ms
scatter) needs a finisher that writes per-segment sums to the dense
table. After the sort, boundary entries ARE unique and sorted — if XLA's
TPU lowering exploits `unique_indices`/`indices_are_sorted` (no collision
handling -> vectorizable), the whole VJP drops ~10x.
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
    # sorted unique indices: a strided ramp with jitter, sorted, unique by
    # construction (stride 1.3 > 1)
    base = np.sort(rng.choice(R, M, replace=False)).astype(np.int32)
    idx_sorted_unique = jnp.asarray(base)
    perm = rng.permutation(M)
    idx_unique = jnp.asarray(base[perm])  # unique, unsorted
    upd = jnp.asarray(rng.randn(M, 2).astype(np.float32))

    def make(iu, so):
        @jax.jit
        def f(idx, upd):
            tbl = jnp.zeros((R, 2), jnp.float32)
            tbl = tbl.at[idx].add(upd, unique_indices=iu,
                                  indices_are_sorted=so)
            return jnp.sum(tbl[:128] ** 2)
        return f

    def args_s(i):
        return (idx_sorted_unique, upd * (1.0 + 1e-4 * i))

    def args_u(i):
        return (idx_unique, upd * (1.0 + 1e-4 * i))

    timed(make(False, False), args_u, label="scatter (no flags)")
    timed(make(True, False), args_u, label="scatter unique")
    timed(make(True, True), args_s, label="scatter unique+sorted")


if __name__ == "__main__":
    main()
