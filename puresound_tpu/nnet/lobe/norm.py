"""Normalization layers over channel-first [N, C, T] (or [N, CH, C, T]) data.

Parity targets: puresound/nnet/lobe/norm.py (GlobLN :20, ChanLN :37,
InstantLN :53, LayerNorm2D :71, aliases :91-97, registry :100).

All stats are computed in float32 regardless of input dtype (bf16-safe).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


def _stat_dtype(dtype):
    return jnp.promote_types(dtype, jnp.float32)


def _moments(x, axes):
    """Single-pass mean/variance with f32 accumulation.

    var = E[x^2] - mean^2 instead of E[(x - mean)^2]: the two-pass form
    materializes a full-size f32 (x - mean) tensor that autodiff also
    stores as a backward residual — measured as the dominant HBM traffic
    of the bf16 train step (the normalize itself stays in input dtype).
    """
    xf = x.astype(_stat_dtype(x.dtype))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=axes, keepdims=True)
                      - mean * mean, 0.0)
    return mean, var


def _normalize(x, mean, var, eps):
    """(x - mean) * rsqrt(var + eps) carried out in x.dtype (mean/rstd are
    per-sample scalars — casting them down costs nothing; keeping the
    full-size arithmetic in f32 doubles activation+residual bytes)."""
    import jax

    rstd = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)


class _GainBiasLN(nn.Module):
    """Shared gamma/beta of shape [C] applied on the channel axis (dim 1).

    setup-style (not @nn.compact) so fused kernels can read gamma/beta
    without invoking the module; the param tree is unchanged.
    """

    channel_size: int
    eps: float = 1e-8

    def setup(self):
        self.gamma = self.param("gamma", nn.initializers.ones,
                                (self.channel_size,))
        self.beta = self.param("beta", nn.initializers.zeros,
                               (self.channel_size,))

    def _affine(self, normed):
        # channel axis is dim 1; broadcast gamma/beta over trailing dims;
        # cast the affine params DOWN so bf16 activations stay bf16
        shape = (1, self.channel_size) + (1,) * (normed.ndim - 2)
        return (normed * self.gamma.reshape(shape).astype(normed.dtype)
                + self.beta.reshape(shape).astype(normed.dtype))


class GlobLN(_GainBiasLN):
    """Global layer norm: normalize over every non-batch dim."""

    def __call__(self, x):
        axes = tuple(range(1, x.ndim))
        mean, var = _moments(x, axes)
        return self._affine(_normalize(x, mean, var, self.eps))


class ChanLN(_GainBiasLN):
    """Channel-wise layer norm: normalize over the channel dim only."""

    def __call__(self, x):
        mean, var = _moments(x, (1,))
        return self._affine(_normalize(x, mean, var, self.eps))


class InstantLN(_GainBiasLN):
    """Instant layer norm over (channel, freq) of a [N, CH, C, T] tensor."""

    def __call__(self, x):
        N, CH, C, T = x.shape
        flat = x.reshape(N, CH * C, T)
        mean, var = _moments(flat, (1,))
        return self._affine(_normalize(flat, mean, var, self.eps)
                            ).reshape(N, CH, C, T)


class LayerNorm2D(nn.Module):
    """Channel+frequency layer norm for [N, CH, C, T] with [1,CH,C,1] affine.

    Uses the unbiased std (ddof=1) to match torch `.std()` semantics
    (norm.py:85).
    """

    ch: int
    f: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        w = self.param("w", nn.initializers.ones, (1, self.ch, self.f, 1))
        b = self.param("b", lambda key, shape: 1e-4 * jnp.ones(shape), (1, self.ch, self.f, 1))
        n = x.shape[1] * x.shape[2]
        mean, var = _moments(x, (1, 2))
        std = jnp.sqrt(var * (n / max(n - 1, 1)))  # unbiased (torch .std())
        inv = (1.0 / (std + self.eps)).astype(x.dtype)
        return ((x - mean.astype(x.dtype)) * inv
                * w.astype(x.dtype) + b.astype(x.dtype))


class BatchNorm(nn.Module):
    """BatchNorm over the channel axis (dim 1) of channel-first tensors.

    Equivalent of torch BatchNorm1d/2d for [N, C, T] / [N, C, H, W]; keeps
    running stats in the `batch_stats` collection.
    """

    channel_size: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        reduce_axes = (0,) + tuple(range(2, x.ndim))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.channel_size,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.channel_size,), jnp.float32))
        gamma = self.param("scale", nn.initializers.ones, (self.channel_size,))
        beta = self.param("bias", nn.initializers.zeros, (self.channel_size,))

        if train:
            xf = x.astype(_stat_dtype(x.dtype))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.maximum(jnp.mean(xf * xf, axis=reduce_axes)
                              - mean * mean, 0.0)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        shape = (1, self.channel_size) + (1,) * (x.ndim - 2)
        import jax

        rstd = jax.lax.rsqrt(var.reshape(shape) + self.eps)
        return ((x - mean.reshape(shape).astype(x.dtype))
                * rstd.astype(x.dtype)
                * gamma.reshape(shape).astype(x.dtype)
                + beta.reshape(shape).astype(x.dtype))


class GroupNorm1(_GainBiasLN):
    """GroupNorm with a single group == layer norm over (C, *), eps 1e-8.

    The reference's `gGN` alias (norm.py:96). Identical math to GlobLN for
    [N, C, T] but kept as a distinct name for registry parity.
    """

    def __call__(self, x):
        axes = tuple(range(1, x.ndim))
        mean, var = _moments(x, axes)
        normed = ((x - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return self._affine(normed)


class LayerNormLast(nn.Module):
    """torch-style nn.LayerNorm over the LAST dim (eps 1e-5, affine)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean, var = _moments(x, (-1,))
        return (_normalize(x, mean, var, self.eps)
                * gamma.astype(x.dtype) + beta.astype(x.dtype))


# Registry (aliases mirror norm.py:91-97)
gLN = GlobLN
cLN = ChanLN
iLN = InstantLN
bN1d = BatchNorm
bN2d = BatchNorm
gGN = GroupNorm1
LN2D = LayerNorm2D

_REGISTRY = {"gLN": GlobLN, "cLN": ChanLN, "iLN": InstantLN,
             "bN1d": BatchNorm, "bN2d": BatchNorm, "gGN": GroupNorm1}

_IS_BATCHNORM = {"bN1d", "bN2d"}


def get_norm(name: str) -> Callable[..., Any]:
    if name not in _REGISTRY:
        raise NameError(f"Could not interpret normalization identifier: {name}")
    return _REGISTRY[name]


def is_batchnorm(name: str) -> bool:
    return name in _IS_BATCHNORM


def apply_norm(norm_module, x, train: bool = False):
    """Call a norm module, passing `train` only to BatchNorm."""
    if isinstance(norm_module, BatchNorm):
        return norm_module(x, train=train)
    return norm_module(x)
