"""Time in-kernel [16,128]<->[128,16] vector transposes (both directions)
and the XLA-side [C,16,128]<->[C,128,16] batch transposes.

The chunk-major blend backward regressed to ~1.5s/step; suspects are the
reverse-direction transpose lowering. One kernel invocation loops N
transposes so per-op cost is measurable above relay noise.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LOOP = 4000


def _kern(x_ref, o_ref, *, fwd: bool):
    def body(i, acc):
        y = jnp.transpose(x_ref[...]) * (1.0 + 1e-9 * i)
        return acc + jnp.sum(y)

    o_ref[0, 0] = jax.lax.fori_loop(0, N_LOOP, body, jnp.zeros((), jnp.float32))


def run(shape):
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))
    f = pl.pallas_call(
        functools.partial(_kern, fwd=True),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        v = float(f(x * (1.0 + i * 1e-5))[0, 0])
        ts.append(time.perf_counter() - t0)
    us = min(ts) / N_LOOP * 1e6
    print(f"kernel transpose {shape}: {us:.2f} us/op (val {v:.3e})",
          flush=True)


def run_xla(shape, perm):
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))

    @jax.jit
    def f(x):
        return jnp.sum(jnp.transpose(x, perm) ** 2)

    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        v = float(f(x * (1.0 + i * 1e-5)))
        ts.append(time.perf_counter() - t0)
    print(f"xla transpose {shape} perm {perm}: {min(ts)*1e3:.2f} ms "
          f"(val {v:.3e})", flush=True)


run((16, 128))
run((128, 16))
c = 8192
run_xla((c, 128, 16), (0, 2, 1))
run_xla((c, 16, 128), (0, 2, 1))


# NOTE (round-3 finding): the XLA timings above are INVALID as transpose
# costs — sum(transpose(x)**2) lets XLA elide the transpose entirely. A
# materialized [C,16,128]->(0,2,1) relayout measured ~1.5 s at C=8735 in
# the real backward (profile history in CLAUDE.md). The kernel-transpose
# numbers are real but context-dependent: the same op inside a DMA
# while_loop lowered to ~257 us/chunk. Trust bench.py deltas only.
