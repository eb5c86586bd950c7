"""Attention primitives: sinusoidal positions, MHA with causal/context-window
masks, transformer encoder block (optionally LSTM-improved, DPTNet-style).

Parity: puresound/nnet/lobe/attention.py.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .rnn import LSTM


class PositionalEncoding(nn.Module):
    """Standard sinusoidal positions added to [N, T, C]."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    def setup(self):
        if self.d_model % 2 != 0:
            raise ValueError("PositionalEncoding needs an even d_model")
        position = np.arange(self.max_len)[:, None]
        div_term = np.exp(np.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model))
        pe = np.zeros((self.max_len, self.d_model), np.float32)
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)
        self._pe = pe
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = x.shape[1]
        x = x + jnp.asarray(self._pe)[None, :T, :]
        return self.drop(x, deterministic=not train)


def attention_mask(size_q: int, causal: bool, context_range: Optional[int] = None):
    """Additive attention mask [L, S] (0 = attend, -inf = blocked).

    Reproduces the reference's causal and context-window policies
    (attention.py:79-108). Returns None when unmasked.
    """
    if not causal and context_range is None:
        return None
    i = jnp.arange(size_q)[:, None]
    j = jnp.arange(size_q)[None, :]
    if context_range is None:
        blocked = j > i
    elif causal:
        blocked = (j <= i - context_range) | (j > i)
    else:
        # symmetric window: |i-j| >= context_range-1 blocked (reference
        # tril(diagonal=-(context_range-1)) + its transpose)
        blocked = abs(i - j) >= context_range - 1
    return jnp.where(blocked, -jnp.inf, 0.0)


class MHA(nn.Module):
    """Multi-head attention, no biases (torch MultiheadAttention(bias=False)).

    q/k/v: [N, T, C] -> (out [N, T, C], attention weights averaged over heads).
    """

    embed_dim: int
    heads: int = 1

    def setup(self):
        d = self.embed_dim
        bound = np.sqrt(6.0 / (3 * d + d))  # xavier_uniform on [3E, E]
        self.in_proj = self.param(
            "in_proj",
            lambda key: jax.random.uniform(key, (3 * d, d), minval=-bound, maxval=bound))
        bound_o = np.sqrt(6.0 / (d + d))
        self.out_proj = self.param(
            "out_proj",
            lambda key: jax.random.uniform(key, (d, d), minval=-bound_o, maxval=bound_o))

    def __call__(self, query, key, value, causal: bool = True,
                 context_range: Optional[int] = None):
        N, T, C = query.shape
        H = self.heads
        Dh = C // H
        wq, wk, wv = jnp.split(self.in_proj, 3, axis=0)
        q = (query @ wq.T).reshape(N, T, H, Dh)
        k = (key @ wk.T).reshape(N, T, H, Dh)
        v = (value @ wv.T).reshape(N, T, H, Dh)
        logits = jnp.einsum("nthd,nshd->nhts", q, k) / jnp.sqrt(Dh).astype(q.dtype)
        mask = attention_mask(T, causal, context_range)
        if mask is not None:
            logits = logits + mask[None, None]
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhts,nshd->nthd", weights, v).reshape(N, T, C)
        out = out @ self.out_proj.T
        return out, jnp.mean(weights, axis=1)


class MhaSelfAttenLayer(nn.Module):
    """Transformer encoder block; optional LSTM feed-forward ("improved").

    x: [N, C, T] -> [N, C, T]. Parity: attention.py:116-232.
    """

    feats_dim: int
    hidden_dim: int
    nhead: int
    dropout: float = 0.0
    improved: bool = False
    bidirectional: bool = False
    position_encoding: bool = True

    def setup(self):
        self.self_atten = MHA(self.feats_dim, self.nhead)
        self.atten_drop = nn.Dropout(self.dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        if not self.improved:
            if self.position_encoding:
                self.pos = PositionalEncoding(self.feats_dim, self.dropout)
            self.ff1 = nn.Dense(self.hidden_dim)
            self.ff2 = nn.Dense(self.feats_dim)
            self.ff_drop1 = nn.Dropout(self.dropout)
            self.ff_drop2 = nn.Dropout(self.dropout)
        else:
            self.recurrent = LSTM(self.feats_dim, self.hidden_dim, self.bidirectional)
            self.ff_drop1 = nn.Dropout(self.dropout)
            self.ff2 = nn.Dense(self.feats_dim)
            self.ff_drop2 = nn.Dropout(self.dropout)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, x: jnp.ndarray, causal: bool = False,
                 context_range: Optional[int] = None,
                 return_atten_weight: bool = False, train: bool = False):
        x = jnp.swapaxes(x, 1, 2)  # [N, T, C]
        src = x
        if not self.improved and self.position_encoding:
            x = self.pos(x, train=train)
        x, w = self.self_atten(x, x, x, causal=causal, context_range=context_range)
        x = self.atten_drop(x, deterministic=not train)
        x = self.norm1(src + x)

        src = x
        if self.improved:
            x, _ = self.recurrent(x)
            x = self.ff_drop1(jax.nn.relu(x), deterministic=not train)
            x = self.ff_drop2(self.ff2(x), deterministic=not train)
        else:
            x = self.ff_drop1(jax.nn.relu(self.ff1(x)), deterministic=not train)
            x = self.ff_drop2(self.ff2(x), deterministic=not train)
        x = self.norm2(src + x)
        x = jnp.swapaxes(x, 1, 2)
        if return_atten_weight:
            return x, w
        return x
