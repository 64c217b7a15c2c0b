"""Custom learnable layers.

Reference behavior: Tools/expLayer.m:28-33 (Z = exp(alpha .* X), learnable
per-channel alpha) and Tools/MyTanhLayer.m:28-33 (Z = alpha * tanh(X / alpha),
a saturating layer with a learnable scale), used optionally in the deep LSTM
stack of testScripts/test04FullFeatureExtMLpipeline.m:476-477.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ExpLayer(nn.Module):
    """Z = exp(alpha * X) with per-channel learnable alpha."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.normal(1.0),
                           (self.features,))
        return jnp.exp(alpha * x)


class ScaledTanhLayer(nn.Module):
    """Z = alpha * tanh(X / alpha) with per-channel learnable alpha."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.features,))
        safe = jnp.where(jnp.abs(alpha) > 1e-8, alpha, 1e-8)
        return safe * jnp.tanh(x / safe)
