"""TPU A/B: packed-key binning sort + fused-MLP overhead isolation."""
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
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.ops import fused_mlp as fm
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
    pre = preprocess(means, scales, rots, ops, w2v, full, 800, 800,
                     tanfov, tanfov,
                     colors_precomp=jnp.zeros((n, 3), jnp.float32))

    timeit("binning packed-key sort", lambda m: bin_gaussians(
        m[:, :2] * 400 + 400, pre.depths, pre.radii, 50, 50, 16,
        tile_cap=1024, dup_cap=5 * n, build_table=False), means)

    # old 2-operand stable sort, inline, for a same-program A/B
    from splatfields_tpu.ops.raster.binning import duplicate_instances

    def old_binning(m):
        tile, gid, total, order, _ = duplicate_instances(
            m[:, :2] * 400 + 400, pre.depths, pre.radii, 50, 50, 16, 5 * n)
        sorted_tile, sorted_id = jax.lax.sort((tile, gid), num_keys=1,
                                              is_stable=True)
        ts = jnp.searchsorted(sorted_tile,
                              jnp.arange(2501, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
        return sorted_tile, sorted_id, ts

    timeit("binning old stable-payload sort", old_binning, means)

    # ---- fused kernel, direct op level (bypasses flax + pack_params) ----
    cfgs = [
        dict(name="mlp_rgb", emb_cols=39, hidden=128, depth=6,
             skips=(3,), out=3),
        dict(name="mlp_scale", emb_cols=27, hidden=64, depth=4,
             skips=(2,), out=3),
        dict(name="mlp_opacity", emb_cols=21, hidden=64, depth=4,
             skips=(2,), out=1),
        dict(name="mlp_rotation", emb_cols=21, hidden=64, depth=3,
             skips=(20,), out=4),
    ]
    plan = fm.build_plan(cfgs, emb_dim=39, feat_dim=48)
    tree = {}
    for head in plan.heads:
        tree[head.name] = {
            f"net_{i}": {
                "weight": jnp.asarray(rng.randn(L.fin, L.fout) * 0.05,
                                      jnp.float32),
                "bias": jnp.zeros((L.fout,), jnp.float32)}
            for i, L in enumerate(head.layers)}
    w, b = fm.pack_params(tree, plan)
    emb = jnp.asarray(rng.randn(n, 39).astype(np.float32))
    feat = jnp.asarray(rng.randn(n, 48).astype(np.float32))

    for blk in (1024, 2048):
        timeit(f"fused direct fwd blk={blk}",
               lambda e, f, blk=blk: fm.fused_heads(
                   plan, blk, jnp.bfloat16, False, e, f, w, b), emb, feat)
        timeit(f"fused direct fwd+bwd blk={blk}",
               lambda e, f, blk=blk: jax.value_and_grad(
                   lambda ww: sum(jnp.sum(jnp.tanh(o))
                                  for o in fm.fused_heads(
                       plan, blk, jnp.bfloat16, False, e, f, ww, b)))(w),
               emb, feat)

    # pack_params cost alone
    timeit("pack_params alone", lambda e: fm.pack_params(
        jax.tree.map(lambda a: a * (1 + jnp.sum(e) * 1e-30), tree), plan),
        emb)


if __name__ == "__main__":
    main()
