"""Shared frame-streaming machinery for dual-path Unet bottleneck models
(DPCRN, DPARN): 1-frame conv time contexts + carried inter-LSTM state.

Mixed into the model classes; requires causal configs (time kernels 2,
strides 1, no delay/lookahead) and bottleneck blocks exposing
`step_chunk(x_frames, h, c)`.
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

    def stream_frames(self, x: jnp.ndarray, state: dict):
        """Process a chunk of frames through the streaming path.

        x: [B, C, K] -> (mask [B, C, K], new state). Matches __call__ on
        chunked input exactly (causal configs).

        TPU-first chunked form: convolutions and the frame-local intra
        (frequency) pass run BATCHED over all K frames (conv layers just
        prepend their 1-frame carry); only the inter (time) LSTM scans —
        and it scans K cheap steps. No per-frame serialization of the
        expensive frequency pass.
        """
        n = self._n_cnn
        B, C, K = x.shape
        h = self._pack_input(x)  # [B, 2, F, K]
        skips = [h]
        new_down = []
        for i in range(n):
            new_down.append(h[..., -1])
            inp = jnp.concatenate([state["down"][i][..., None], h], axis=-1)
            kf = self.kernel_f[i]
            h = self.cnn_down[i](inp, pad=((kf // 2, kf // 2), (0, 0)))
            h = self.down_act[i](apply_norm(self.down_norm[i], h, False))
            skips.append(h)

        h, h1, c1 = self.dprnn_block1.step_chunk(h, state["h1"], state["c1"])
        h, h2, c2 = self.dprnn_block2.step_chunk(h, state["h2"], state["c2"])

        new_up = []
        for j in range(n):
            h = jnp.concatenate([h, skips[-j - 1]], axis=1)
            new_up.append(h[..., -1])
            inp = jnp.concatenate([state["up"][j][..., None], h], axis=-1)
            y_full = self.cnn_up[j](inp)  # time length K+2 (transposed)
            h = y_full[..., 1 : K + 1]  # causal outputs for this chunk
            if self.up_norm[j] is not None:
                h = self.up_act[j](apply_norm(self.up_norm[j], h, False))
        mask = self._unpack_output(h)  # [B, C, K]
        new_state = dict(state, down=new_down, up=new_up,
                         h1=h1, c1=c1, h2=h2, c2=c2)
        return mask, new_state
