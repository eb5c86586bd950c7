"""Conditioning and misc layers: Magnitude, Gate, FiLM, SplitMerge,
MovingAverage1D, spectral compression, SpecAugment.

Parity: puresound/nnet/lobe/trivial.py.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cnn import Conv1d
from .norm import ChanLN, LayerNormLast
from .activation import PReLU


class LambdaLayer(nn.Module):
    fn: callable = None

    def __call__(self, x, **kwargs):
        return self.fn(x, **kwargs)


class Magnitude(nn.Module):
    """Complex ([N,C,T,2] or RI-concat [N,2C,T]) -> magnitude [N,C,T].

    Parity: trivial.py:21-58.
    """

    drop_first: bool = True
    log1p: bool = False

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 4:
            re, im = x[..., 0], x[..., 1]
        elif x.ndim == 3:
            re, im = jnp.split(x, 2, axis=1)
        else:
            raise TypeError("Magnitude expects 3-D or 4-D input")
        if self.drop_first:
            re, im = re[:, 1:, :], im[:, 1:, :]
        mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        if self.log1p:
            mag = jnp.log1p(mag)
        return mag


class Gate(nn.Module):
    """Gated conditioning block: x * sigmoid(branch([x; cond])) + residual.

    x: [N, C, T], condition: [N, E]. Parity: trivial.py:61-126.
    """

    input_size: int
    hidden_size: int
    embed_size: int
    dropout: float = 0.0

    def setup(self):
        self.in_conv = Conv1d(self.input_size, self.hidden_size, 1, use_bias=False)
        self.left_conv = Conv1d(self.hidden_size, self.hidden_size, 1, use_bias=False)
        self.left_norm = ChanLN(self.hidden_size)
        self.left_act = PReLU()
        self.right_conv = Conv1d(self.hidden_size + self.embed_size,
                                 self.hidden_size, 1, use_bias=False)
        self.right_norm = ChanLN(self.hidden_size)
        self.right_act = PReLU()
        self.out_conv = Conv1d(self.hidden_size, self.input_size, 1, use_bias=False)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray, train: bool = False):
        res = x
        x = self.in_conv(x)
        cond = jnp.broadcast_to(condition[:, :, None],
                                (*condition.shape, x.shape[-1]))
        x_r = jnp.concatenate([x, cond], axis=1)
        left = self.drop(self.left_act(self.left_norm(self.left_conv(x))),
                         deterministic=not train)
        right = jax.nn.sigmoid(
            self.drop(self.right_act(self.right_norm(self.right_conv(x_r))),
                      deterministic=not train))
        x = self.out_conv(left * right)
        return x + res


class FiLM(nn.Module):
    """Feature-wise linear modulation from [x; cond]: scale*x + bias.

    x: [N, C, T], condition: [N, E]. Parity: trivial.py:129-167.
    """

    feats_size: int
    embed_size: int
    input_norm: bool = True

    def setup(self):
        self.cond_scale = Conv1d(self.feats_size + self.embed_size,
                                 self.feats_size, 1, use_bias=False)
        self.cond_bias = Conv1d(self.feats_size + self.embed_size,
                                self.feats_size, 1, use_bias=False)
        if self.input_norm:
            self.norm = LayerNormLast(self.feats_size)

    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray,
                 feature_last: bool = False,
                 batch_axis: int = 0) -> jnp.ndarray:
        """feature_last=True takes/returns x as [N, T, C] (batch_axis=0)
        or time-major [T, N, C] (batch_axis=1) and applies the 1x1
        conditioning convs as feature-last matmuls (identical math;
        no channel-first layout round trips — see Conv1d.dense_last)."""
        if feature_last:
            xn = self.norm(x) if self.input_norm else x
            cond = (condition[:, None, :] if batch_axis == 0
                    else condition[None, :, :])
            cond = jnp.broadcast_to(cond, (x.shape[0], x.shape[1],
                                           condition.shape[-1]))
            cat = jnp.concatenate([xn, cond], axis=-1)
            return (self.cond_scale.dense_last(cat) * xn
                    + self.cond_bias.dense_last(cat))
        if self.input_norm:
            x = jnp.swapaxes(self.norm(jnp.swapaxes(x, 1, 2)), 1, 2)
        cond = jnp.broadcast_to(condition[:, :, None],
                                (*condition.shape, x.shape[-1]))
        cat = jnp.concatenate([x, cond], axis=1)
        return self.cond_scale(cat) * x + self.cond_bias(cat)


class SplitMerge:
    """50%-overlap chunk split/merge for dual-path models.

    Pure reshape/pad functions (jit-friendly, no parameters).
    Parity: trivial.py:170-241.
    """

    @staticmethod
    def split(x: jnp.ndarray, seg_size: int) -> Tuple[jnp.ndarray, int]:
        """x: [N, C, T] -> (segments [N, S, K, C], rest)."""
        seg_stride = seg_size // 2
        N, C, T = x.shape
        rest = seg_size - (seg_stride + T % seg_size) % seg_size
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (0, 0), (seg_stride, seg_stride)))
        T2 = x.shape[-1]
        seg1 = x[:, :, :-seg_stride].reshape(N, C, -1, seg_size)
        seg2 = x[:, :, seg_stride:].reshape(N, C, -1, seg_size)
        segments = jnp.concatenate([seg1, seg2], axis=-1).reshape(N, C, -1, seg_size)
        return segments.transpose(0, 2, 3, 1), rest

    @staticmethod
    def merge(x: jnp.ndarray, rest: int) -> jnp.ndarray:
        """x: [N, S, K, C] -> [N, C, T]."""
        N, S, K, C = x.shape
        seg_stride = K // 2
        x = x.transpose(0, 3, 1, 2).reshape(N, C, -1, K * 2)
        x1 = x[:, :, :, :K].reshape(N, C, -1)[:, :, seg_stride:]
        x2 = x[:, :, :, K:].reshape(N, C, -1)[:, :, :-seg_stride]
        out = (x1 + x2) / 2
        if rest > 0:
            out = out[..., :-rest]
        return out


class MovingAverage1D(nn.Module):
    """Simple moving average over [N, T]. Parity: trivial.py:244-294."""

    kernel_size: int
    stride: int
    add_padding: bool = False
    causal: bool = True

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.add_padding:
            if self.causal:
                x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0)))
            else:
                half = self.kernel_size // 2
                x = jnp.pad(x, ((0, 0), (half, half)))
        w = jnp.full((1, 1, self.kernel_size), 1.0 / self.kernel_size, x.dtype)
        y = jax.lax.conv_general_dilated(
            x[:, None, :], w, window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y[:, 0, :]


def spectral_compression(x: jnp.ndarray, alpha: float = 0.3, dim: int = 1):
    """mag^alpha * e^{i*angle(phase)} on RI-concat input (trivial.py:297-304)."""
    re, im = jnp.split(x, 2, axis=dim)
    mag = jnp.sqrt(re**2 + im**2 + 1e-8) ** alpha
    phase = jnp.arctan2(im, re)
    return mag * jnp.exp(1j * jnp.angle(phase))


class SpecAugment(nn.Module):
    """Random time/freq masking on [N, C, T] (training-time augmentation).

    Mask widths are sampled uniformly in [0, mask_length) with a uniform
    start, the same policy as torchaudio mask_along_axis (trivial.py:307-335).
    Identity when not training.
    """

    freq_mask_length: int
    time_mask_length: int
    fill_value: float = 0.0

    def _mask_axis(self, key, x, mask_len, axis):
        size = x.shape[axis]
        k1, k2 = jax.random.split(key)
        value = jax.random.uniform(k1) * mask_len
        min_value = jax.random.uniform(k2) * (size - value)
        idx = jnp.arange(size, dtype=jnp.float32)
        mask = (idx >= min_value) & (idx < min_value + value)
        shape = [1] * x.ndim
        shape[axis] = size
        return jnp.where(mask.reshape(shape), self.fill_value, x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train:
            return x
        key = self.make_rng("dropout")
        kf, kt = jax.random.split(key)
        if self.freq_mask_length:
            x = self._mask_axis(kf, x, self.freq_mask_length, 1)
        if self.time_mask_length:
            x = self._mask_axis(kt, x, self.time_mask_length, 2)
        return x
