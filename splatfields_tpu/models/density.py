"""SDF -> volume-density transfer functions (flax).

Parity target: reference ``scene/tripFields.py:18-55`` — ``LaplaceDensity``
(VolSDF's alpha * Laplace(0, beta).cdf(-sdf)) and ``BellDensity`` (a
logistic-bell density). Upstream these are imported by
``utils/time_utils.py:7`` but never constructed from any released config;
ported for unqualified totality (VERDICT r4 item 7 / PARITY.md).

Learnable scalars are flax params so they train exactly like the torch
``nn.Parameter`` originals when wired into a field.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LaplaceDensity(nn.Module):
    """density(sdf) = (1/beta) * Laplace(loc=0, scale=beta).cdf(-sdf)
    with beta = |beta_param| + beta_min (reference tripFields.py:18-37)."""
    beta_init: float = 0.1
    beta_min: float = 1e-4

    def setup(self):
        self.beta_param = self.param(
            "beta", lambda key: jnp.asarray(self.beta_init, jnp.float32))

    def get_beta(self):
        return jnp.abs(self.beta_param) + self.beta_min

    def inv_s(self):
        return 1.0 / self.get_beta()

    def __call__(self, sdf, beta=None):
        if beta is None:
            beta = self.get_beta()
        alpha = 1.0 / beta
        # 0.5 + 0.5*sign(x)*expm1(-|x|/beta) == Laplace cdf at -sdf
        return alpha * (0.5 + 0.5 * jnp.sign(sdf)
                        * jnp.expm1(-jnp.abs(sdf) / beta))


class BellDensity(nn.Module):
    """density(sdf) = gamma * e^(-lamb*sdf) / (1 + e^(-lamb*sdf))^2 — the
    derivative-of-sigmoid bell (reference tripFields.py:39-55; its trailing
    lines after the return are dead code)."""

    def setup(self):
        self.lamb = self.param(
            "lamb", lambda key: jnp.asarray(1.0, jnp.float32))
        self.gamma = self.param(
            "gamma", lambda key: jnp.asarray(1.0, jnp.float32))

    def inv_s(self):
        return self.lamb

    def __call__(self, sdf, beta=None):
        arg = jnp.exp(-self.lamb * sdf)
        return self.gamma * arg / jnp.square(1.0 + arg)
