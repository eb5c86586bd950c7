"""Shared frame-streaming machinery for dual-path Unet bottleneck models
(DPCRN, DPARN): 1-frame conv time contexts + carried inter-LSTM state.

Mixed into the model classes; requires causal configs (time kernels 2,
strides 1, no delay/lookahead) and bottleneck blocks exposing
`step(x_frame, h, c)`.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .lobe.norm import apply_norm


class DualPathStreaming:
    # ------------------------------------------------------------- streaming
    def _stream_shapes(self):
        """(down_freqs per layer input, channels) for stream-state layout."""
        freqs = [self.num_freq]
        for s in self.stride_f:
            f = freqs[-1]
            freqs.append(f // s + (0 if f % s == 0 else 1))
        return freqs, self._chans

    def init_stream_state(self, batch: int, dtype=jnp.float32) -> dict:
        """Streaming state: 1-frame time context per conv layer (all time
        kernels are 2, causal) + inter-LSTM carries of both DPRNN blocks."""
        assert self.causal_streamable(), (
            "streaming requires a causal config (transpose_delay=False, all "
            "delays 0, time kernels 2, time strides 1)")
        freqs, chans = self._stream_shapes()
        n = self._n_cnn
        down_prev = [jnp.zeros((batch, chans[i], freqs[i]), dtype)
                     for i in range(n)]
        up_prev = [jnp.zeros((batch, 2 * chans[n - j], freqs[n - j]), dtype)
                   for j in range(n)]
        Fb = freqs[-1]
        H = self.rnn_hidden
        carry = lambda: jnp.zeros((1, batch * Fb, H), dtype)
        return {"down": down_prev, "up": up_prev,
                "h1": carry(), "c1": carry(), "h2": carry(), "c2": carry()}

    def causal_streamable(self) -> bool:
        return (not self.transpose_delay
                and all(d == 0 for d in self.delay)
                and all(k == 2 for k in self.kernel_t)
                and all(s == 1 for s in self.stride_t)
                and self.transpose_t_size == 2
                and not self.skip_conv
                and not self.spectral_compress)

    def _frame_step(self, st: dict, x_t: jnp.ndarray):
        """One frame through down convs -> DPRNN blocks -> up convs.

        x_t: [B, C] (RI-concat feature frame) -> mask frame [B, C]."""
        n = self._n_cnn
        x = self._pack_input(x_t[:, :, None])  # [B, 2, F, 1]
        skips = [x]
        new_down = []
        for i in range(n):
            new_down.append(x[..., 0])
            inp2 = jnp.concatenate([st["down"][i][..., None], x], axis=-1)
            kf = self.kernel_f[i]
            x = self.cnn_down[i](inp2, pad=((kf // 2, kf // 2), (0, 0)))
            x = self.down_act[i](apply_norm(self.down_norm[i], x, False))
            skips.append(x)

        x, h1, c1 = self.dprnn_block1.step(x, st["h1"], st["c1"])
        x, h2, c2 = self.dprnn_block2.step(x, st["h2"], st["c2"])

        new_up = []
        for j in range(n):
            x = jnp.concatenate([x, skips[-j - 1]], axis=1)
            new_up.append(x[..., 0])
            inp2 = jnp.concatenate([st["up"][j][..., None], x], axis=-1)
            y_full = self.cnn_up[j](inp2)  # time length 3 (transposed)
            x = y_full[..., 1:2]  # the current causal output frame
            if self.up_norm[j] is not None:
                x = self.up_act[j](apply_norm(self.up_norm[j], x, False))
        mask = self._unpack_output(x)[:, :, 0]  # [B, C]
        new_st = dict(st, down=new_down, up=new_up, h1=h1, c1=c1, h2=h2, c2=c2)
        return new_st, mask

    def stream_frames(self, x: jnp.ndarray, state: dict):
        """Process frames through the streaming path.

        x: [B, C, T] -> (mask [B, C, T], new state). Matches __call__ on
        chunked input exactly (causal configs)."""
        scan = nn.scan(
            lambda mdl, carry, xt: mdl._frame_step(carry, xt),
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        xs = x.transpose(2, 0, 1)  # [T, B, C]
        state, ys = scan(self, state, xs)
        return ys.transpose(1, 2, 0), state
