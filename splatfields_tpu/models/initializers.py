"""Weight initializers matching the reference's torch defaults.

Initialization parity matters for reproducing the paper's optimization
behavior: the CNN prior of SplatFields (SURVEY 2.14-2.15) depends on
kaiming-normal convs with zero-init residual branches
(``scene/time_decoders.py:611-625``), and every Linear in the field heads
uses torch's default kaiming-uniform (U(-1/sqrt(fan_in), 1/sqrt(fan_in))).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """flax kernel [in, out]; torch default U(-k, k), k = 1/sqrt(fan_in)."""
    fan_in = shape[0]
    k = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -k, k)


def torch_linear_bias(fan_in):
    def init(key, shape, dtype=jnp.float32):
        k = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -k, k)
    return init


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """mmcv kaiming_init defaults: normal, fan_out, relu gain.

    flax conv kernel layout [kh, kw, in, out]: fan_out = kh*kw*out.
    """
    kh, kw, _, out = shape
    std = np.sqrt(2.0 / (kh * kw * out))
    return std * jax.random.normal(key, shape, dtype)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def siren_first_layer(key, shape, dtype=jnp.float32):
    """SIREN first layer: U(-1/fan_in, 1/fan_in) (reference
    ``utils/time_utils.py:110-114``)."""
    fan_in = shape[0]
    return jax.random.uniform(key, shape, dtype, -1.0 / fan_in, 1.0 / fan_in)


def siren_hidden_layer(key, shape, dtype=jnp.float32):
    """SIREN hidden: U(-sqrt(6/fan_in)/30, +) (reference ``:100-106``)."""
    fan_in = shape[0]
    k = np.sqrt(6.0 / fan_in) / 30.0
    return jax.random.uniform(key, shape, dtype, -k, k)


def normal_scaled(scale):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)
    return init
