"""Attentive statistics pooling (speaker embedding head).

Parity: puresound/nnet/lobe/pooling.py:9-127.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cnn import Conv1d
from .norm import BatchNorm


def length_to_mask(length: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] binary mask."""
    return (jnp.arange(max_len)[None, :] < length[:, None]).astype(jnp.float32)


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean+std pool: [N, C, L] -> [N, 2C, 1]."""

    channels: int
    attention_channels: int = 128
    eps: float = 1e-12

    def setup(self):
        self.tdnn_conv = Conv1d(self.channels, self.attention_channels, 1)
        self.tdnn_bn = BatchNorm(self.attention_channels)
        self.conv = Conv1d(self.attention_channels, self.channels, 1)

    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 return_weight: bool = False, train: bool = False):
        N, C, L = x.shape
        if lengths is None:
            lengths = jnp.ones((N,))
        mask = length_to_mask(lengths * L, L)[:, None, :]  # [N, 1, L]

        attn = self.tdnn_bn(jax.nn.relu(self.tdnn_conv(x)), train=train)
        attn = self.conv(jnp.tanh(attn))
        attn = jnp.where(mask == 0, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=2)
        if return_weight:
            return attn
        mean = jnp.sum(attn * x, axis=2)
        var = jnp.sum(attn * (x - mean[:, :, None]) ** 2, axis=2)
        std = jnp.sqrt(jnp.clip(var, min=self.eps))
        return jnp.concatenate([mean, std], axis=1)[:, :, None]
