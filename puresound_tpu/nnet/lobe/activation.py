"""Activation registry (parity: puresound/nnet/lobe/activation.py:11-21)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PReLU(nn.Module):
    """PReLU with a single learnable slope (torch default init 0.25).

    setup-style (not @nn.compact) so fused kernels can read `self.alpha`
    without invoking the module; the param tree is unchanged.
    """

    init: float = 0.25

    def setup(self):
        self.alpha = self.param(
            "alpha", lambda key: jnp.asarray([self.init], jnp.float32))

    def __call__(self, x):
        return jnp.where(x >= 0, x, self.alpha.astype(x.dtype) * x)


class ReLU(nn.Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class Mish(nn.Module):
    def __call__(self, x):
        return x * jnp.tanh(jax.nn.softplus(x))


class Sigmoid(nn.Module):
    def __call__(self, x):
        return jax.nn.sigmoid(x)


class Tanh(nn.Module):
    def __call__(self, x):
        return jnp.tanh(x)


_REGISTRY = {"relu": ReLU, "prelu": PReLU, "mish": Mish,
             "sigmoid": Sigmoid, "tanh": Tanh}


def get_activation(name: str):
    if name.lower() not in _REGISTRY:
        raise NameError(f"Could not interpret activation identifier: {name}")
    return _REGISTRY[name.lower()]
