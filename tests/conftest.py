"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

The environment boots an ``axon`` TPU backend from sitecustomize and its
``register()`` sets ``jax_platforms="axon,cpu"`` programmatically, so the
JAX_PLATFORMS env var alone is not enough — override the config after
import as well.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Math-parity tests (weight transplants vs the torch reference, fused-vs-
# sequential head equality) define correctness at f32; the production
# default is bf16 MLP activations (models/mlp.py — quality-gated on TPU).
# A dedicated test covers the bf16 path explicitly (test_fields.py).
os.environ.setdefault("SPLATFIELDS_MLP_BF16", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
