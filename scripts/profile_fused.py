"""Fused Pallas MLP kernel vs flax GeneralMLP heads on TPU, real shapes.

Timing: float() materialization (block_until_ready does not reliably block
on the axon backend) + index-perturbed carried input so neither the relay
execution cache nor XLA loop-invariant hoisting can skip the work.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu.models.splatfields import SplatFields

ITERS = 20


def timeit(name, step_fn, x0, *args):
    def program(x, *a):
        def body(i, carry):
            acc, s = carry
            out = step_fn(x * (1.0 + s * 1e-22 + jnp.float32(i) * 1e-20),
                          *a)
            leaves = jax.tree.leaves(out)
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
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))

    for mode, label in (("on", "fused"), ("off", "flax")):
        os.environ["SPLATFIELDS_FUSED_MLP"] = mode
        net = SplatFields(n_frames=0, radius=1.0, encoder_type="",
                          composition_rank=0)
        fv = net.init(jax.random.PRNGKey(0), xyz)

        timeit(f"heads fwd ({label})",
               lambda x, v: net.apply(v, x), xyz, fv)
        timeit(f"heads fwd+bwd ({label})",
               lambda x, v: jax.value_and_grad(
                   lambda p: sum(jnp.sum(jnp.tanh(o))
                                 for o in net.apply(
                                     dict(v, params=p), x).values()
                                 if o is not None))(v["params"]),
               xyz, fv)

    # fused with smaller blocks
    os.environ["SPLATFIELDS_FUSED_MLP"] = "on"
    for blk in (256, 512):
        net = SplatFields(n_frames=0, radius=1.0, encoder_type="",
                          composition_rank=0, fused_block=blk)
        fv = net.init(jax.random.PRNGKey(0), xyz)
        timeit(f"heads fwd+bwd (fused blk={blk})",
               lambda x, v: jax.value_and_grad(
                   lambda p: sum(jnp.sum(jnp.tanh(o))
                                 for o in net.apply(
                                     dict(v, params=p), x).values()
                                 if o is not None))(v["params"]),
               xyz, fv)


if __name__ == "__main__":
    main()
