"""A/B attribution for the round-2 perf changes, in-program-loop timed.

Compares, on the real TPU:
- pallas blend (double-buffered) vs the pre-change serial kernel
  (extracted from git history into /tmp/blend_pallas_old.py),
- field net fwd+bwd with fuse_heads on/off,
- adam_update_fused vs adam_update on the field param tree,
- grid_sample const_coords custom-VJP vs plain advanced-index.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util
import time

import jax
import jax.numpy as jnp
import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

from splatfields_tpu import config as cfg_lib
from splatfields_tpu.models import splats as S
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.models.splatfields import SplatFields
from splatfields_tpu.ops.grid_sample import (
    grid_sample_2d, grid_sample_2d_const_coords)
from splatfields_tpu.ops.raster.binning import bin_gaussians
from splatfields_tpu.ops.raster.blend_jax import pack_attributes
from splatfields_tpu.ops.raster import blend_pallas as bp_new
from splatfields_tpu.ops.raster.preprocess import preprocess
from splatfields_tpu.utils import camera_math as cm

ITERS = 20


def load_old_blend():
    spec = importlib.util.spec_from_file_location(
        "blend_pallas_old", "/tmp/blend_pallas_old.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def timeit(name, step_fn, *args):
    def program(*a):
        def body(i, acc):
            out = step_fn(acc * 1e-20 + jnp.float32(i) * 1e-12, *a)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                             for l in leaves)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    prog = jax.jit(program)
    jax.block_until_ready(prog(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(prog(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


def main():
    import math
    width = height = 800
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
    cols = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    tiles_x = tiles_y = 50

    pre = preprocess(means, scales, rots, ops, w2v, full, width, height,
                     tanfov, tanfov, colors_precomp=cols)
    binning = bin_gaussians(pre.means2d, pre.depths, pre.radii, tiles_x,
                            tiles_y, 16, tile_cap=1024, dup_cap=5 * n,
                            build_table=False)
    pack = pack_attributes(pre.means2d, pre.conics, pre.rgb, pre.opacity,
                           pre.depths)
    sp = pack[jnp.maximum(binning.sorted_id, 0)]

    bp_old = load_old_blend()
    for name, mod in (("new (double-buffered)", bp_new),
                      ("old (serial dma)", bp_old)):
        bl = lambda s: mod.blend_sorted_pallas(
            s, binning.tile_start, binning.counts, tiles_x, tiles_y, 16,
            1024, 128)
        timeit(f"blend fwd {name}", lambda e, s: bl(s + e)[0], sp)
        timeit(f"blend fwd+bwd {name}", lambda e, s: jax.grad(
            lambda ss: sum(x.sum() for x in bl(ss + e)))(s), sp)

    # field net fuse on/off
    for fuse in (True, False):
        net = SplatFields(n_frames=0, radius=1.0,
                          encoder_type="VarTriPlaneEncoder",
                          composition_rank=0, fuse_heads=fuse)
        fv = net.init(jax.random.PRNGKey(0), means)
        timeit(f"field fwd+bwd fuse_heads={fuse}",
               lambda e, v, x: jax.grad(
                   lambda p: net.apply(dict(v, params=p),
                                       x + e)["means3D"].sum())(v["params"]),
               fv, means)

    # adam variants on the field tree
    net = SplatFields(n_frames=0, radius=1.0,
                      encoder_type="VarTriPlaneEncoder",
                      composition_rank=0)
    fv = net.init(jax.random.PRNGKey(0), means)
    fp = fv["params"]
    opt = S.adam_init(fp)
    grads = jax.tree.map(jnp.ones_like, fp)
    timeit("field adam fused", lambda e, p, g, o: S.adam_update_fused(
        jax.tree.map(lambda a: a + e, p), g, o, 1e-3), fp, grads, opt)
    timeit("field adam tree-map", lambda e, p, g, o: S.adam_update(
        jax.tree.map(lambda a: a + e, p), g, o, 1e-3), fp, grads, opt)

    # grid sample custom vjp vs plain
    planes = jnp.asarray(rng.randn(3, 16, 160, 160).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    axes = [(0, 1), (0, 2), (1, 2)]
    for name, fn in (("const_coords vjp", grid_sample_2d_const_coords),
                     ("plain advanced", grid_sample_2d)):
        gs = lambda e, pl: jnp.concatenate(
            [fn(pl[i], pts[:, list(ax)] + e) for i, ax in enumerate(axes)],
            axis=1)
        timeit(f"grid_sample x3 fwd+bwd {name}",
               lambda e, pl: jax.grad(lambda q: gs(e, q).sum())(pl), planes)


if __name__ == "__main__":
    main()
