"""Additive angular margin softmax classifier head.

Parity: puresound/nnet/loss/aamsoftmax.py:8-44.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class AAMsoftmax(nn.Module):
    input_dim: int
    n_class: int
    margin: float = 0.2
    scale: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        weight = self.param(
            "weight", nn.initializers.xavier_normal(), (self.n_class, self.input_dim))
        xn = x / jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
        wn = weight / jnp.linalg.norm(weight, axis=1, keepdims=True).clip(1e-12)
        cosine = xn @ wn.T  # [N, n_class]
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        cos_m = math.cos(self.margin)
        sin_m = math.sin(self.margin)
        th = math.cos(math.pi - self.margin)
        mm = math.sin(math.pi - self.margin) * self.margin
        phi = cosine * cos_m - sine * sin_m
        phi = jnp.where(cosine - th > 0, phi, cosine - mm)
        one_hot = jax.nn.one_hot(label, self.n_class)
        logits = (one_hot * phi + (1.0 - one_hot) * cosine) * self.scale
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(one_hot * logp, axis=-1))
