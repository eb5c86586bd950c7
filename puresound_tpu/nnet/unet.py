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

    # ------------------------------------------------------------- streaming
    def causal_streamable(self) -> bool:
        """Chunked streaming needs 1-frame conv context per down layer (time
        kernel 2, stride 1, no per-layer delay) and the semi-causal or causal
        transpose mode; skip_conv adds no state but isn't exercised by the
        streamable zoo configs."""
        return (all(k == 2 for k in self.kernel_t)
                and all(s == 1 for s in self.stride_t)
                and all(d == 1 for d in self.dilation_t)
                and all(d == 0 for d in self.delay)
                and self.transpose_t_size == 2
                and not self.skip_conv
                and self.multi_output == 1)

    @property
    def stream_delay_frames(self) -> int:
        """Mask-output delay in frames. With transpose_delay each up layer's
        output needs one FUTURE frame (offline trims the transpose output on
        the LEFT), so streaming emits the mask `n_layers` frames late — this
        is the documented lookahead (e.g. 6 layers * 128 hop = 768 samples
        for tse_unet_tcn_v0_causal, +384 OLA = 1152; reference unet.py:298).
        The first `stream_delay_frames` emitted frames are warm-up garbage."""
        return len(self.kernel_t) if self.transpose_delay else 0

    def _stream_freqs(self):
        freqs = [self.num_freq]
        for s in self.stride_f:
            f = freqs[-1]
            freqs.append(f // s + (0 if f % s == 0 else 1))
        return freqs

    def _init_unet_stream_state(self, batch: int, dtype=jnp.float32) -> dict:
        assert self.causal_streamable(), (
            "streaming needs time kernels 2, strides/dilations 1, no delay, "
            "transpose_t_size 2, no skip_conv")
        freqs, chans, n = self._stream_freqs(), self._chans, self._n_cnn
        state = {
            "down": [jnp.zeros((batch, chans[i], freqs[i]), dtype)
                     for i in range(n)],
            "up": [jnp.zeros((batch, 2 * chans[n - j], freqs[n - j]), dtype)
                   for j in range(n)],
        }
        if self.transpose_delay:
            # up layer j's stream is j frames behind real time; FIFO of j
            # down frames realigns the skip connection with it
            state["skipq"] = [
                jnp.zeros((batch, chans[n - j], freqs[n - j], j), dtype)
                for j in range(n)]
        return state

    def _stream_down(self, x: jnp.ndarray, state: dict,
                     n_layers: Optional[int] = None):
        """x: [B, C, K] frames -> (bottleneck [B, ch, F, K], skips, updates).
        n_layers stops after that many down layers (center-fused kernels
        take over the rest; state['down'] then holds that many carries)."""
        h = self._pack_input(x)
        skips = [h]
        new_down = []
        for i in range(self._n_cnn if n_layers is None else n_layers):
            new_down.append(h[..., -1])
            kf = self.kernel_f[i]
            h = self.cnn_down[i].stream_apply(h, state["down"][i],
                                              (kf // 2, kf // 2))
            h = self.down_act[i](apply_norm(self.down_norm[i], h, False))
            skips.append(h)
        return h, skips, new_down

    def _stream_up(self, h: jnp.ndarray, skips, state: dict,
                   start: int = 0):
        """h: bottleneck output [B, ch, F, K] -> (mask [B, C, K], updates).
        start skips the first `start` up layers (center-fused kernels
        already applied them; state['up'][j - start] then carries layer j).

        Streaming a transpose layer keeps the last input frame pending; the
        conv over [pending | K inputs] yields K+2 raw frames of which
        [1 : K+1] are exactly the offline (left-trimmed) outputs delayed by
        one frame (causal mode: the same slice IS the offline output).
        ConvTranspose2d.stream_apply computes that slice concat-free (the
        pending frame enters as a 1-tap correction on frame 0)."""
        K = h.shape[-1]
        n = self._n_cnn
        new_up, new_skipq = [], []
        for j in range(start, n):
            skip_now = skips[-j - 1]
            if self.transpose_delay and j > 0:
                cat = jnp.concatenate([state["skipq"][j], skip_now], axis=-1)
                skip_use = cat[..., :K]
                new_skipq.append(cat[..., K:])
            else:
                skip_use = skip_now
                new_skipq.append(state["skipq"][j]
                                 if self.transpose_delay else None)
            h = jnp.concatenate([h, skip_use], axis=1)
            new_up.append(h[..., -1])
            y = self.cnn_up[j].stream_apply(h, state["up"][j - start])
            if self.up_norm[j] is not None:
                y = self.up_act[j](apply_norm(self.up_norm[j], y, False))
            h = y
        return self._unpack_output(h), new_up, new_skipq


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

    # ------------------------------------------------------------- streaming
    def init_stream_state(self, batch: int, dtype=jnp.float32) -> dict:
        assert self.causal, "streaming requires a causal TCN bottleneck"
        state = self._init_unet_stream_state(batch, dtype)
        state["tcn"] = [layer.init_ctx(batch, dtype)
                        for stack in self.tcn_list for layer in stack]
        return state

    def stream_frames(self, x: jnp.ndarray, state: dict,
                      dvec: Optional[jnp.ndarray] = None):
        """Chunked streaming step: x [B, C, K] -> (mask [B, C, K], state').

        With transpose_delay the emitted mask lags the input by
        `stream_delay_frames` frames (first emissions are warm-up):
        stream[..., t] == offline[..., t - delay]. Causal mode
        (transpose_delay=False) is frame-exact with no delay."""
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        h, skips, new_down = self._stream_down(x, state)
        B, ch, Fb, K = h.shape
        t = h.reshape(B, ch * Fb, K)
        new_tcn = []
        idx = 0
        for stack in self.tcn_list:
            for i, layer in enumerate(stack):
                e = dvec if self.tcn_with_embed[i] else None
                t, c = layer.step_chunk(t, e, state["tcn"][idx])
                new_tcn.append(c)
                idx += 1
        h = t.reshape(B, ch, Fb, K)
        mask, new_up, new_skipq = self._stream_up(h, skips, state)
        new_state = dict(state, down=new_down, up=new_up, tcn=new_tcn)
        if self.transpose_delay:
            new_state["skipq"] = new_skipq
        return mask, new_state


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

    # ------------------------------------------------------------- streaming
    def init_stream_state(self, batch: int, dtype=jnp.float32) -> dict:
        assert self.fsmn_r_context == 0, (
            "streaming requires causal FSMN layers (r_context 0)")
        state = self._init_unet_stream_state(batch, dtype)
        state["fsmn"] = [layer.init_ctx(batch, dtype)
                         for layer in self.fsmn_list]
        return state

    def stream_frames(self, x: jnp.ndarray, state: dict,
                      dvec: Optional[jnp.ndarray] = None):
        """Chunked streaming step: x [B, C, K] -> (mask [B, C, K], state').
        Same delay contract as UnetTcn.stream_frames (the FSMN memory chain
        runs across layers within the chunk, only the context conv rings
        carry time)."""
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        h, skips, new_down = self._stream_down(x, state)
        B, ch, Fb, K = h.shape
        t = h.reshape(B, ch * Fb, K)
        new_rings = []
        memory = None
        for i, layer in enumerate(self.fsmn_list):
            e = dvec if self.fsmn_with_embed[i] else None
            t, memory, ring = layer.step_chunk(t, memory, state["fsmn"][i],
                                               embed=e)
            new_rings.append(ring)
        h = t.reshape(B, ch, Fb, K)
        mask, new_up, new_skipq = self._stream_up(h, skips, state)
        new_state = dict(state, down=new_down, up=new_up, fsmn=new_rings)
        if self.transpose_delay:
            new_state["skipq"] = new_skipq
        return mask, new_state
