"""A/B: quad-packed vs const-coords plane sampling on TPU (x3 planes).

Timing-harness note (hard-won): a loop-varying scalar added to the PLANE
does not defeat loop-invariant code motion — XLA rewrites
gather(planes + e) = gather(planes) + e and hoists the gather. The
perturbation must hit the gather INDICES (coords), which pass through
floor() and cannot be distributed. The carried scalar chains through the
output sum, so iterations stay serial.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu.ops import grid_sample as gs

ITERS = 20


def timeit(name, step_fn, pts, *args):
    def program(pts, *a):
        def body(i, carry):
            acc, s = carry
            out = step_fn(pts * (1.0 + s * 1e-22 + jnp.float32(i) * 1e-20),
                          *a)
            leaves = jax.tree.leaves(out)
            tot = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30 for l in leaves)
            return acc + tot, tot
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.float32(0), jnp.float32(0)))[0]

    prog = jax.jit(program)
    # warmup and timed call must use DIFFERENT args (the relay caches
    # identical (program, args) executions), and the result must be
    # MATERIALIZED with float() — block_until_ready does not reliably
    # block on the axon backend (measured: 0.01 ms vs 4.4 ms real)
    float(prog(pts, *args))
    pts2 = pts * (1.0 + 1e-7)
    t0 = time.perf_counter()
    float(prog(pts2, *args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


def main():
    n = 100_000
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(3, 16, 320, 320).astype(np.float32))
    pts0 = jnp.asarray(rng.uniform(-0.95, 0.95, (n, 3)).astype(np.float32))
    axes = ((0, 1), (1, 2), (2, 0))

    def sample_quad(pts, planes):
        feats = [gs.grid_sample_2d_quad(planes[i], pts[:, list(ax)])
                 for i, ax in enumerate(axes)]
        return jnp.concatenate(feats, axis=-1)

    def sample_const(pts, planes):
        feats = [gs.grid_sample_2d_const_coords(planes[i], pts[:, list(ax)])
                 for i, ax in enumerate(axes)]
        return jnp.concatenate(feats, axis=-1)

    def sample_quad_bf16(pts, planes):
        feats = []
        for i, ax in enumerate(axes):
            rows = gs.pack_quad_rows(planes[i]).astype(jnp.bfloat16)
            feats.append(gs._quad_sample(
                rows, pts[:, list(ax)], (320, 320)).astype(jnp.float32))
        return jnp.concatenate(feats, axis=-1)

    timeit("quad x3 fwd", sample_quad, pts0, planes)
    timeit("const x3 fwd", sample_const, pts0, planes)
    timeit("quad x3 fwd bf16 table", sample_quad_bf16, pts0, planes)
    # value_and_grad (the op is linear in planes — a grad-only program
    # would DCE the forward gather entirely); nonlinear squeeze on the
    # value keeps the cotangent data-dependent too
    timeit("quad x3 fwd+bwd", lambda pts, p: jax.value_and_grad(
        lambda pp: jnp.sum(jnp.tanh(sample_quad(pts, pp))))(p),
        pts0, planes)
    timeit("const x3 fwd+bwd", lambda pts, p: jax.value_and_grad(
        lambda pp: jnp.sum(jnp.tanh(sample_const(pts, pp))))(p),
        pts0, planes)

    # real bench config: 160^2 planes, 16 channels (quad rows = 64 lanes)
    planes160 = jnp.asarray(rng.randn(3, 16, 160, 160).astype(np.float32))

    def sample_quad160(pts, planes):
        feats = [gs.grid_sample_2d_quad(planes[i], pts[:, list(ax)])
                 for i, ax in enumerate(axes)]
        return jnp.concatenate(feats, axis=-1)

    timeit("quad x3 160^2 fwd", sample_quad160, pts0, planes160)
    timeit("quad x3 160^2 fwd+bwd", lambda pts, p: jax.value_and_grad(
        lambda pp: jnp.sum(jnp.tanh(sample_quad160(pts, pp))))(p),
        pts0, planes160)


if __name__ == "__main__":
    main()
