"""Exponential moving average of model parameters.

Functional equivalent of the reference's vendored timm ExponentialMovingAverage
(ref optim/ema.py:14-284 — shipped but never wired into any runner; provided
here for capability parity as a jit-friendly pytree transform):

    shadow <- decay * shadow + (1 - decay) * params
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class ModelEma:
    def __init__(self, params, decay: float = 0.9999):
        self.decay = decay
        self.shadow = jax.tree.map(jnp.asarray, params)
        self._update = jax.jit(
            lambda shadow, params: jax.tree.map(
                lambda s, p: self.decay * s + (1.0 - self.decay) * p,
                shadow, params))

    def update(self, params):
        self.shadow = self._update(self.shadow, params)
        return self.shadow

    def state_dict(self):
        return self.shadow
