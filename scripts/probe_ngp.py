"""Probe: where do the NGP backbone's milliseconds live on TPU?

Decomposes the 1.2 s/step ngp bench row: hash-encode forward vs
forward+table-grad vs the full NGPMLP, at the bench scale (100k points,
16 levels, 2^20 table). Sound-harness rules (CLAUDE.md): multiplicative
coord perturbation chained through the loss, tanh nonlinearity so the
grad-only program can't DCE the forward, float() materialization.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

from splatfields_tpu.models.encoders import HashGridEncoder, NGPMLP


def timed(fn, args_fn, n=5, label=""):
    # warmup with one arg set, then time with fresh values each iter
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
    n = 100_000
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    enc = HashGridEncoder(n_levels=16, log2_hashmap_size=20)
    v = enc.init(jax.random.PRNGKey(0), pts)

    @jax.jit
    def enc_fwd(v, s):
        out = enc.apply(v, jnp.clip(pts * s, 0.0, 1.0))
        return jnp.sum(jnp.tanh(out))

    @jax.jit
    def enc_fwdbwd(v, s):
        def loss(v):
            out = enc.apply(v, jnp.clip(pts * s, 0.0, 1.0))
            return jnp.sum(jnp.tanh(out))
        l, g = jax.value_and_grad(loss)(v)
        return l + jnp.sum(g["params"]["table"][:64] ** 2)

    mlp = NGPMLP(log2_hashmap_size=20)
    pts3 = jnp.asarray((rng.rand(n, 3).astype(np.float32) - 0.5) * 1.6)
    vm = mlp.init(jax.random.PRNGKey(1), pts3)

    @jax.jit
    def mlp_fwdbwd(vm, s):
        def loss(vm):
            out = mlp.apply(vm, pts3 * s)
            return jnp.sum(jnp.tanh(out))
        l, g = jax.value_and_grad(loss)(vm)
        return l + jnp.sum(
            g["params"]["encoding"]["table"][:64] ** 2)

    def args(i):
        return (v, jnp.asarray(1.0 + 1e-4 * i, jnp.float32))

    def argsm(i):
        return (vm, jnp.asarray(1.0 + 1e-4 * i, jnp.float32))

    timed(enc_fwd, args, label="hash encode fwd (100k x 16 lvl)")
    timed(enc_fwdbwd, args, label="hash encode fwd+bwd")
    timed(mlp_fwdbwd, argsm, label="NGPMLP fwd+bwd")


if __name__ == "__main__":
    main()
