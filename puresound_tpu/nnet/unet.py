"""Frequency-axis U-Net with causal time padding + per-layer lookahead, and
the TCN / FSMN bottleneck variants.

Parity: puresound/nnet/unet.py (Unet :13, UnetTcn :298, UnetFsmn :559).
The shape algebra is preserved exactly:
- down layer i: ZeroPad (time: (k_t-1-delay, delay); freq: centered) then
  Conv2d stride (s_f, s_t)
- up layer: ConvTranspose2d(kernel (k_f, t_kernel), stride, padding k_f//2,
  output_padding s_f - k_f + 2*(k_f//2)) then trim (t_kernel-1) frames from
  the right (or the left when transpose_delay=True — the semi-causal
  lookahead mode).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .conv_tasnet import TCN, GatedTCN
from .lobe.activation import get_activation
from .lobe.cnn import Conv2d, ConvTranspose2d
from .lobe.norm import get_norm, apply_norm
from .lobe.rnn import FSMN, ConditionFSMN


class Unet(nn.Module):
    """Freq-axis down/up 2-D CNN. x: [N, C, T] (RI-concat or real) ->
    mask [N, C, T] (or [N, M, C, T] when multi_output > 1)."""

    input_type: str = "RI"
    input_dim: int = 512
    activation_type: str = "PReLU"
    norm_type: str = "bN2d"
    dropout: float = 0.05
    channels: Tuple = (1, 1, 8, 8, 16, 16)
    transpose_t_size: int = 2
    skip_conv: bool = False
    kernel_t: Tuple = (5, 1, 9, 1, 1)
    stride_t: Tuple = (1, 1, 1, 1, 1)
    dilation_t: Tuple = (1, 1, 1, 1, 1)
    kernel_f: Tuple = (1, 5, 1, 5, 1)
    stride_f: Tuple = (1, 4, 1, 4, 1)
    dilation_f: Tuple = (1, 1, 1, 1, 1)
    delay: Tuple = (0, 0, 1, 0, 0)
    multi_output: int = 1
    transpose_delay: bool = False

    @property
    def num_freq(self) -> int:
        if self.input_type.lower() == "ri":
            return self.input_dim // 2
        elif self.input_type.lower() == "real":
            return self.input_dim
        raise TypeError("input_type must be RI or Real")

    @property
    def in_ch(self) -> int:
        ch0 = self.channels[0]
        return ch0 * 2 if self.input_type.lower() == "ri" else ch0

    def setup(self):
        n = len(self.kernel_t)
        assert (len(self.kernel_f) == len(self.stride_t) == len(self.stride_f)
                == len(self.dilation_t) == len(self.dilation_f) == n)
        self._n_cnn = n
        chans = list(self.channels)
        chans[0] = self.in_ch
        self._chans = chans
        act = get_activation(self.activation_type.lower())
        norm = get_norm(self.norm_type)

        down, down_norm, down_act = [], [], []
        for i in range(n):
            kf, kt = self.kernel_f[i], self.kernel_t[i]
            freq_pad = (kf // 2, kf // 2)
            time_pad = (kt - self.delay[i] - 1, self.delay[i])
            down.append(Conv2d(chans[i], chans[i + 1], (kf, kt),
                               stride=(self.stride_f[i], self.stride_t[i]),
                               dilation=(self.dilation_f[i], self.dilation_t[i]),
                               pad=(freq_pad, time_pad)))
            down_norm.append(norm(chans[i + 1]))
            down_act.append(act())
        self.cnn_down = down
        self.down_norm = down_norm
        self.down_act = down_act
        self.down_drop = nn.Dropout(self.dropout)

        up, up_norm, up_act = [], [], []
        skip_double = 1 if self.skip_conv else 2
        for i in reversed(range(n)):
            s = self.stride_f[i]
            k = self.kernel_f[i]
            p = k // 2
            op = s - k + 2 * p
            out_ch = (chans[i] if i != 0 else chans[i] * self.multi_output)
            up.append(ConvTranspose2d(chans[i + 1] * skip_double, out_ch,
                                      (k, self.transpose_t_size),
                                      stride=(self.stride_f[i], self.stride_t[i]),
                                      dilation=(self.dilation_f[i], self.dilation_t[i]),
                                      padding=(p, 0), output_padding=(op, 0)))
            if i != 0:
                up_norm.append(norm(chans[i]))
                up_act.append(act())
            else:
                up_norm.append(None)
                up_act.append(None)
        self.cnn_up = up
        self.up_norm = up_norm
        self.up_act = up_act

        if self.skip_conv:
            sk, sk_act = [], []
            for i in reversed(range(n)):
                sk.append(Conv2d(chans[i + 1], chans[i + 1], (1, 1)))
                sk_act.append(act())
            self.skip_cnn = sk
            self.skip_act = sk_act

    # ------------------------------------------------------------ components
    def _pack_input(self, x):
        """[N, C, T] -> [N, CH, F, T] (RI as 2 channels)."""
        if self.input_type.lower() == "ri":
            re, im = jnp.split(x, 2, axis=-2)
            return jnp.stack([re, im], axis=1)
        if x.ndim == 3:
            return x[:, None]
        return x

    def _unpack_output(self, x):
        if self.multi_output != 1:
            N, ch, F, T = x.shape
            x = x.reshape(N, self.multi_output, -1, F, T)
            if self.input_type.lower() == "ri":
                return jnp.concatenate([x[:, :, 0], x[:, :, 1]], axis=2)
            return x[:, :, 0]
        if self.input_type.lower() == "ri":
            return jnp.concatenate([x[:, 0], x[:, 1]], axis=1)
        return x[:, 0]

    def _down(self, x, train):
        skips = [x]
        for i in range(self._n_cnn):
            x = self.cnn_down[i](x)
            x = self.down_act[i](apply_norm(self.down_norm[i], x, train))
            x = self.down_drop(x, deterministic=not train)
            skips.append(x)
        return x, skips

    def _up(self, x, skips, train):
        for i in range(self._n_cnn):
            if self.skip_conv:
                x = x + self.skip_act[i](self.skip_cnn[i](skips[-i - 1]))
            else:
                x = jnp.concatenate([x, skips[-i - 1]], axis=1)
            x = self.cnn_up[i](x)
            if self.up_norm[i] is not None:
                x = self.up_act[i](apply_norm(self.up_norm[i], x, train))
            if self.transpose_t_size != 1:
                if self.transpose_delay:
                    x = x[..., (self.transpose_t_size - 1):]
                else:
                    x = x[..., : -(self.transpose_t_size - 1)]
        return x

    def shape_info(self):
        down_shape = [self.num_freq]
        f = self.num_freq
        for i in range(self._n_cnn):
            s = self.stride_f[i]
            f = f // s + (0 if f % s == 0 else 1)
            down_shape.append(f)
        up_shape = [f]
        for i in range(self._n_cnn):
            s = self.stride_f[-i - 1]
            k = self.kernel_f[-i - 1]
            p = k // 2
            op = s - k + 2 * p
            f = (up_shape[-1] - 1) * s - 2 * p + self.dilation_f[-i - 1] * (k - 1) + op + 1
            up_shape.append(f)
        return down_shape, up_shape

    def bottleneck_dim(self) -> int:
        f = self.num_freq
        for s in self.stride_f:
            f = f // s + (0 if f % s == 0 else 1)
        return f * self._chans[-1]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._pack_input(x)
        x, skips = self._down(x, train)
        x = self._up(x, skips, train)
        return self._unpack_output(x)


class UnetTcn(Unet):
    """Unet with a TCN bottleneck on flattened (ch*freq) features and
    optional embedding injection. Parity: unet.py:298-556."""

    embed_dim: int = 0
    embed_norm: bool = False
    tcn_layer: str = "normal"
    tcn_kernel: int = 3
    tcn_dim: int = 256
    tcn_dilated_basic: int = 2
    per_tcn_stack: int = 5
    repeat_tcn: int = 4
    tcn_with_embed: Tuple = (1, 0, 0, 0, 0)
    tcn_use_film: bool = False
    tcn_norm: str = "gLN"
    dconv_norm: str = "gGN"
    causal: bool = False

    def setup(self):
        super().setup()
        dim = self.bottleneck_dim()
        assert self.per_tcn_stack == len(self.tcn_with_embed)
        stacks = []
        for _ in range(self.repeat_tcn):
            stack = []
            for i in range(self.per_tcn_stack):
                emb = self.embed_dim if self.tcn_with_embed[i] else 0
                if self.tcn_layer.lower() == "normal":
                    stack.append(TCN(dim, self.tcn_dim, kernel=self.tcn_kernel,
                                     dilation=self.tcn_dilated_basic**i,
                                     emb_dim=emb, causal=self.causal,
                                     tcn_norm=self.tcn_norm,
                                     dconv_norm=self.dconv_norm))
                elif self.tcn_layer.lower() == "gated":
                    stack.append(GatedTCN(dim, self.tcn_dim, kernel=self.tcn_kernel,
                                          dilation=self.tcn_dilated_basic**i,
                                          emb_dim=emb, causal=self.causal,
                                          tcn_norm=self.tcn_norm,
                                          use_film=self.tcn_use_film if emb else False))
                else:
                    raise NameError(self.tcn_layer)
            stacks.append(stack)
        self.tcn_list = stacks

    def __call__(self, x: jnp.ndarray, dvec: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        x = self._pack_input(x)
        x, skips = self._down(x, train)
        N, ch, F, T = x.shape
        x = x.reshape(N, ch * F, T)
        for stack in self.tcn_list:
            for i, layer in enumerate(stack):
                if self.tcn_with_embed[i]:
                    x = layer(x, dvec, train=train)
                else:
                    x = layer(x, train=train)
        x = x.reshape(N, ch, F, T)
        x = self._up(x, skips, train)
        return self._unpack_output(x)


class UnetFsmn(Unet):
    """Unet with an FSMN bottleneck and memory chaining across layers.

    Parity: unet.py:559-763.
    """

    embed_dim: int = 0
    embed_norm: bool = False
    fsmn_l_context: int = 3
    fsmn_r_context: int = 0
    fsmn_dim: int = 256
    num_fsmn: int = 8
    fsmn_with_embed: Tuple = (1, 1, 1, 1, 1, 1, 1, 1)
    fsmn_norm: str = "gLN"
    use_film: bool = True

    def setup(self):
        super().setup()
        dim = self.bottleneck_dim()
        assert self.num_fsmn == len(self.fsmn_with_embed)
        layers = []
        for i in range(self.num_fsmn):
            if self.fsmn_with_embed[i]:
                layers.append(ConditionFSMN(
                    dim, dim, self.fsmn_dim, self.fsmn_l_context,
                    self.fsmn_r_context, norm_type=self.fsmn_norm,
                    embed_dim=self.embed_dim, use_film=self.use_film))
            else:
                layers.append(FSMN(dim, dim, self.fsmn_dim, self.fsmn_l_context,
                                   self.fsmn_r_context, norm_type=self.fsmn_norm))
        self.fsmn_list = layers

    def __call__(self, x: jnp.ndarray, dvec: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        x = self._pack_input(x)
        x, skips = self._down(x, train)
        N, ch, F, T = x.shape
        x = x.reshape(N, ch * F, T)
        memory = None
        for i, layer in enumerate(self.fsmn_list):
            if self.fsmn_with_embed[i]:
                x, memory = layer(x, dvec, memory, train=train)
            else:
                x, memory = layer(x, memory, train=train)
        x = x.reshape(N, ch, F, T)
        x = self._up(x, skips, train)
        return self._unpack_output(x)
