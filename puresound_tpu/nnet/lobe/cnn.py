"""Conv building blocks: depthwise-separable dilated conv, FFC.

Parity: puresound/nnet/lobe/cnn.py (DepthwiseSeparableConv1d :9,
SpectralTransform :109, FFC :184).

Convs are expressed with explicit zero-pad + VALID `lax.conv_general_dilated`
so causal trimming semantics are reproduced exactly while XLA keeps full
freedom to fuse.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .norm import get_norm, apply_norm
from .activation import PReLU


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)
    return init


class Conv1d(nn.Module):
    """torch-compatible Conv1d on [N, C, T] (explicit symmetric padding)."""

    in_channels: int
    out_channels: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True

    def setup(self):
        k = self.groups / (self.in_channels * self.kernel)
        scale = np.sqrt(k)
        self.w = self.param("w", _uniform_init(scale),
                            (self.out_channels, self.in_channels // self.groups, self.kernel))
        if self.use_bias:
            self.b = self.param("b", _uniform_init(scale), (self.out_channels,))

    def __call__(self, x: jnp.ndarray, pad: Optional[int] = None) -> jnp.ndarray:
        """pad overrides the configured symmetric padding (streaming paths
        supply their own time context and pass pad=0)."""
        padding = self.padding if pad is None else pad
        if padding:
            x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
        y = jax.lax.conv_general_dilated(
            x, self.w.astype(x.dtype), window_strides=(self.stride,), padding="VALID",
            rhs_dilation=(self.dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + self.b.astype(x.dtype)[None, :, None]
        return y

    def dense_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply a 1x1 conv as a feature-LAST matmul: x [..., C_in] ->
        [..., C_out]. Same parameters, same math — but the caller keeps a
        feature-last layout, avoiding the [N, C, T] transpose round trips
        that dominated the SkiM conditioning path's HBM traffic (round-5
        HLO audit: the channel-first FiLM materialized ~40 layout copies
        of [rows, C, K] per train step)."""
        assert self.kernel == 1 and self.stride == 1 and self.groups == 1, (
            "dense_last is a 1x1-conv fast path")
        y = x @ self.w[:, :, 0].T.astype(x.dtype)
        if self.use_bias:
            y = y + self.b.astype(x.dtype)
        return y


class Conv2d(nn.Module):
    """torch-compatible Conv2d on [N, C, H, W]; explicit asymmetric padding.

    `pad` is ((top, bottom), (left, right)) on (H, W).
    """

    in_channels: int
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    use_bias: bool = True

    def setup(self):
        k = 1.0 / (self.in_channels * self.kernel[0] * self.kernel[1])
        scale = np.sqrt(k)
        self.w = self.param("w", _uniform_init(scale),
                            (self.out_channels, self.in_channels, *self.kernel))
        if self.use_bias:
            self.b = self.param("b", _uniform_init(scale), (self.out_channels,))

    def __call__(self, x: jnp.ndarray, pad=None) -> jnp.ndarray:
        """pad overrides the configured padding (used by frame-streaming
        paths that supply their own time context)."""
        y = jax.lax.conv_general_dilated(
            x, self.w.astype(x.dtype), window_strides=self.stride,
            padding=self.pad if pad is None else pad,
            rhs_dilation=self.dilation, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            y = y + self.b.astype(x.dtype)[None, :, None, None]
        return y

    def stream_apply(self, h: jnp.ndarray, carry: jnp.ndarray,
                     pad_f: Tuple[int, int]) -> jnp.ndarray:
        """Causal frame-streaming form for time kernel 2 / stride 1.

        Equivalent to `self(concat([carry[..., None], h], -1), pad=(pad_f,
        (0, 0)))` but WITHOUT materializing the [*, K+1]-frame concat
        (measured as a dominant copy at serving batch): the time context
        enters as free conv padding, and the carried frame's contribution
        is a single-tap conv added into frame 0.
        """
        assert self.kernel[1] == 2 and self.stride[1] == 1 \
            and self.dilation[1] == 1
        y = self(h, pad=(pad_f, (1, 0)))
        # the carry may be stored at serving dtype (bf16) while h was
        # upcast mid-path (f32 norms/softmax) — compute the tap at h's dtype
        c = jax.lax.conv_general_dilated(
            carry.astype(h.dtype)[..., None],
            self.w[:, :, :, 0:1].astype(h.dtype),
            window_strides=self.stride, padding=(pad_f, (0, 0)),
            rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.at[:, :, :, :1].add(c)


class ConvTranspose2d(nn.Module):
    """torch-compatible ConvTranspose2d (padding / output_padding semantics).

    out = (in-1)*stride - 2*padding + dilation*(kernel-1) + output_padding + 1
    Implemented as an input-dilated conv with the flipped kernel so shapes and
    values match torch exactly.
    """

    in_channels: int
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True

    def setup(self):
        k = 1.0 / (self.out_channels * self.kernel[0] * self.kernel[1])
        scale = np.sqrt(k)
        # torch layout: [in, out, kH, kW]
        self.w = self.param("w", _uniform_init(scale),
                            (self.in_channels, self.out_channels, *self.kernel))
        if self.use_bias:
            self.b = self.param("b", _uniform_init(scale), (self.out_channels,))

    def _tconv(self, x: jnp.ndarray, w: jnp.ndarray,
               pad_t: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """Transpose conv as an input-dilated conv of the flipped kernel.
        `w` is (a channel slice of) self.w in torch [in, out, kH, kW]
        layout; `pad_t` overrides the derived time padding (streaming)."""
        wf = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)  # [out,in,kH,kW]
        pads = []
        for d in range(2):
            lo = self.dilation[d] * (self.kernel[d] - 1) - self.padding[d]
            hi = lo + self.output_padding[d]
            pads.append((lo, hi))
        if pad_t is not None:
            pads[1] = pad_t
        return jax.lax.conv_general_dilated(
            x, wf.astype(x.dtype), window_strides=(1, 1), padding=pads,
            lhs_dilation=self.stride, rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self._tconv(x, self.w)
        if self.use_bias:
            y = y + self.b.astype(x.dtype)[None, :, None, None]
        return y

    def _stream_assert(self):
        assert self.kernel[1] == 2 and self.stride[1] == 1 \
            and self.dilation[1] == 1 and self.padding[1] == 0 \
            and self.output_padding[1] == 0

    def _carry_tap(self, carry: jnp.ndarray, dtype) -> jnp.ndarray:
        """Frame-0 contribution of the carried (previous-chunk last) input
        frame: a single-tap conv with the earlier-time kernel tap."""
        wf = jnp.flip(self.w, axis=(-2, -1)).transpose(1, 0, 2, 3)
        lo = self.dilation[0] * (self.kernel[0] - 1) - self.padding[0]
        return jax.lax.conv_general_dilated(
            carry.astype(dtype)[..., None], wf[:, :, :, 0:1].astype(dtype),
            window_strides=(1, 1),
            padding=((lo, lo + self.output_padding[0]), (0, 0)),
            lhs_dilation=self.stride, rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def stream_apply(self, h: jnp.ndarray, carry: jnp.ndarray) -> jnp.ndarray:
        """Causal frame-streaming form for time kernel 2 / stride 1 /
        padding 0: `self(concat([carry[..., None], h], -1))[..., 1:K+1]`
        WITHOUT the [*, K+1]-frame concat. The module call on `h` alone
        yields out[t] = W_t1·h[t-1] + W_t0·h[t] (h[-1] = 0) at [..., :K];
        the carried frame only touches frame 0 via the W_t1 tap.

        NOTE: the slice-free variant (asymmetric time pad (1, 0) on the
        input-dilated conv) kernel-faults the TPU at B=4096 (worker crash,
        reproduced twice; B<=3328 fine) — keep the symmetric-pad + slice
        lowering, which is proven at 4096."""
        self._stream_assert()
        K = h.shape[-1]
        y = self(h)[..., :K]
        return y.at[:, :, :, :1].add(self._carry_tap(carry, h.dtype))


class DepthwiseSeparableConv1d(nn.Module):
    """(optional 1x1-in) -> depthwise dilated conv -> 1x1-out, each norm+PReLU.

    Causal mode pads symmetrically then trims the right `padding` samples at
    the block output, matching cnn.py:100-101.
    """

    in_channels: int
    out_channels: int
    hid_channels: Optional[int] = None
    norm_cls: str = "gGN"
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    skip: bool = False
    causal: bool = False

    def setup(self):
        if self.causal and self.norm_cls in ("gLN", "gGN"):
            raise ValueError("Conflict between global normalization and causal operation.")
        norm = get_norm(self.norm_cls)
        hid = self.hid_channels if self.hid_channels is not None else self.in_channels
        self._hid = hid
        self._padding = ((self.kernel - 1) * self.dilation if self.causal
                         else ((self.kernel - 1) // 2) * self.dilation)
        if self.hid_channels is not None:
            self.in_conv = Conv1d(self.in_channels, hid, 1)
            self.in_norm = norm(hid)
            self.in_act = PReLU()
        self.dw_conv = Conv1d(hid, hid, self.kernel, stride=self.stride,
                              dilation=self.dilation, padding=self._padding, groups=hid)
        self.dw_norm = norm(hid)
        self.dw_act = PReLU()
        self.pw_conv = Conv1d(hid, self.out_channels, 1)
        self.pw_norm = norm(self.out_channels)
        self.pw_act = PReLU()
        if self.skip:
            self.skip_conv = Conv1d(self.in_channels, self.out_channels, 1)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = x
        if self.hid_channels is not None:
            res = self.in_act(apply_norm(self.in_norm, self.in_conv(res), train))
        res = self.dw_act(apply_norm(self.dw_norm, self.dw_conv(res), train))
        res = self.pw_act(apply_norm(self.pw_norm, self.pw_conv(res), train))
        if self.causal and self._padding:
            res = res[..., : -self._padding]
        if self.skip:
            res = res + self.skip_conv(x)
        return res

    @property
    def ctx_frames(self) -> int:
        """Causal streaming context length at the depthwise input."""
        return self._padding

    def step_chunk(self, x: jnp.ndarray, ctx: jnp.ndarray):
        """Causal streaming chunk. x: [B, C, K]; ctx: [B, hid, (k-1)*d]
        carried depthwise-input context. Returns (y [B, C_out, K], ctx')."""
        assert self.causal, "step_chunk requires a causal DSConv"
        h = (self.in_act(apply_norm(self.in_norm, self.in_conv(x), False))
             if self.hid_channels is not None else x)
        h_full = jnp.concatenate([ctx, h], axis=-1)
        new_ctx = h_full[..., -self._padding:]
        y = self.dw_act(apply_norm(self.dw_norm,
                                   self.dw_conv(h_full, pad=0), False))
        y = self.pw_act(apply_norm(self.pw_norm, self.pw_conv(y), False))
        if self.skip:
            y = y + self.skip_conv(x)
        return y, new_ctx


class SpectralTransform(nn.Module):
    """FFC spectral branch: rFFT along freq inside a conv block.

    Parity: cnn.py:109-181. x: [N, CH, C, T].
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    causal: bool = True

    def setup(self):
        kf, kt = self.kernel_size
        freq_pad = (kf // 2, kf // 2)
        time_pad = (kt - 1, 0) if self.causal else (kt // 2, kt // 2)
        self.in_conv = Conv2d(self.in_channels, self.out_channels, self.kernel_size,
                              stride=self.stride, pad=(freq_pad, time_pad))
        self.in_bn = get_norm("bN2d")(self.out_channels)
        self.fft_conv = Conv2d(2 * self.out_channels, 2 * self.out_channels, (1, 1))
        self.fft_bn = get_norm("bN2d")(2 * self.out_channels)
        self.out_conv = Conv2d(self.out_channels, self.out_channels, (1, 1))

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jax.nn.relu(apply_norm(self.in_bn, self.in_conv(x), train))
        ffted = jnp.fft.rfft(x, axis=2)
        cat = jnp.concatenate([ffted.real, ffted.imag], axis=1)
        cat = jax.nn.relu(apply_norm(self.fft_bn, self.fft_conv(cat), train))
        re, im = jnp.split(cat, 2, axis=1)
        ffted = jnp.fft.irfft(re + 1j * im, n=x.shape[2], axis=2)
        return self.out_conv(x + ffted.astype(x.dtype))


class FFC(nn.Module):
    """Fast Fourier Convolution block (global/local channel split).

    Parity: cnn.py:184-291. x: [N, CH, C, T].
    """

    in_channels: int
    out_channels: int
    alpha: float = 0.3
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    causal: bool = True

    def setup(self):
        self.fft_in_ch = int(self.in_channels * self.alpha)
        self.fft_out_ch = int(self.out_channels * self.alpha)
        self.local_in_ch = self.in_channels - self.fft_in_ch
        self.local_out_ch = self.out_channels - self.fft_out_ch
        kf, kt = self.kernel_size
        freq_pad = (kf // 2, kf // 2)
        time_pad = (kt - 1, 0) if self.causal else (kt // 2, kt // 2)
        pad = (freq_pad, time_pad)
        self.global_spec_trans = SpectralTransform(
            self.fft_in_ch, self.fft_out_ch, self.kernel_size, self.stride, self.causal)
        self.global_conv = Conv2d(self.fft_in_ch, self.local_out_ch,
                                  self.kernel_size, stride=self.stride, pad=pad)
        self.local_global_conv = Conv2d(self.local_in_ch, self.fft_out_ch,
                                        self.kernel_size, stride=self.stride, pad=pad)
        self.local_local_conv = Conv2d(self.local_in_ch, self.local_out_ch,
                                       self.kernel_size, stride=self.stride, pad=pad)
        self.global_bn = get_norm("bN2d")(self.fft_out_ch)
        self.local_bn = get_norm("bN2d")(self.local_out_ch)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        global_in = x[:, : self.fft_in_ch]
        local_in = x[:, self.fft_in_ch :]
        ffted = self.global_spec_trans(global_in, train)
        g2l = self.global_conv(global_in)
        l2g = self.local_global_conv(local_in)
        l2l = self.local_local_conv(local_in)
        global_out = jax.nn.relu(apply_norm(self.global_bn, ffted + l2g, train))
        local_out = jax.nn.relu(apply_norm(self.local_bn, g2l + l2l, train))
        return jnp.concatenate([local_out, global_out], axis=1)
