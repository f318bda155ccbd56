"""Probe: does the persistent compilation cache work through the axon relay?

Run twice; the second run should skip compilation (fast) and log a cache hit.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)

print("devices:", jax.devices())


@jax.jit
def f(x):
    # something nontrivial so compile time is visible
    for _ in range(8):
        x = jnp.tanh(x @ x.T) @ x
    return x.sum()


t0 = time.perf_counter()
x = jnp.ones((512, 517), jnp.float32)
out = f(x)
out.block_until_ready()
print("first call (compile+run):", time.perf_counter() - t0, "s; out=", out)
