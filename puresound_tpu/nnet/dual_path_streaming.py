"""Shared frame-streaming machinery for dual-path Unet bottleneck models
(DPCRN, DPARN): 1-frame conv time contexts + carried inter-LSTM state.

Mixed into the model classes; the Unet base supplies the down/up streaming
helpers (including the transpose_delay lookahead mode, where each up
layer's output is one frame late and skip connections are realigned by
per-layer FIFOs — see Unet.stream_delay_frames). Bottleneck blocks must
expose `step_chunk(x_frames, h, c)`.
"""
from __future__ import annotations

import jax.numpy as jnp


class DualPathStreaming:
    # ------------------------------------------------------------- streaming
    def _stream_shapes(self):
        """(down_freqs per layer input, channels) for stream-state layout."""
        return self._stream_freqs(), self._chans

    def causal_streamable(self) -> bool:
        return (all(d == 0 for d in self.delay)
                and all(k == 2 for k in self.kernel_t)
                and all(s == 1 for s in self.stride_t)
                and all(d == 1 for d in self.dilation_t)
                and self.transpose_t_size == 2
                and not self.skip_conv
                and not self.spectral_compress)

    def init_stream_state(self, batch: int, dtype=jnp.float32,
                          dp_kernel: bool = False,
                          mk_kernel: bool = False) -> dict:
        """Streaming state: 1-frame time context per conv layer (all time
        kernels are 2, causal) + inter-LSTM carries of both DPRNN blocks
        (+ skip FIFOs when transpose_delay adds per-up-layer lookahead).

        dp_kernel=True lays the inter carries out kernel-natively
        ([F, B, H] per block) for the fused dual-path Pallas kernel.
        mk_kernel=True (DPCRN, causal only) is the center-fused masker
        kernel layout: down carries for layers 0..n-2 and up carries for
        layers 1..n-1 only (the kernel owns d4/u0), plus kernel-native
        d4c/u0h/u0s conv-context carries ([F, B, C])."""
        Fb = self._stream_freqs()[-1]
        H = self.rnn_hidden
        if mk_kernel:
            assert not self.transpose_delay, \
                "mk_kernel supports causal configs only"
            assert self.causal_streamable()
            freqs, chans, n = self._stream_freqs(), self._chans, self._n_cnn
            state = {
                "down": [jnp.zeros((batch, chans[i], freqs[i]), dtype)
                         for i in range(n - 1)],
                "up": [jnp.zeros((batch, 2 * chans[n - j], freqs[n - j]),
                                 dtype) for j in range(1, n)],
                "d4c": jnp.zeros((Fb, batch, chans[n - 1]), dtype),
                "u0h": jnp.zeros((Fb, batch, chans[n]), dtype),
                "u0s": jnp.zeros((Fb, batch, chans[n]), dtype),
            }
        else:
            state = self._init_unet_stream_state(batch, dtype)
        if dp_kernel or mk_kernel:
            carry = lambda: jnp.zeros((Fb, batch, H), dtype)
        else:
            carry = lambda: jnp.zeros((1, batch * Fb, H), dtype)
        state.update(h1=carry(), c1=carry(), h2=carry(), c2=carry())
        return state

    def stream_frames(self, x: jnp.ndarray, state: dict,
                      fused: bool = False, dp_kernel: bool = False,
                      interpret: bool = False, dp_b_tile: int = 0,
                      int8_hh: bool = False, attn_kernel: bool = False,
                      xscr_half: bool = False, mk_kernel: bool = False):
        """Process a chunk of frames through the streaming path.

        x: [B, C, K] -> (mask [B, C, K], new state). Matches __call__ on
        chunked input exactly for causal configs; transpose_delay configs
        emit the mask `stream_delay_frames` frames late (first emissions
        are warm-up), stream[..., t] == offline[..., t - delay].

        TPU-first chunked form: convolutions and the frame-local intra
        (frequency) pass run BATCHED over all K frames (conv layers just
        prepend their 1-frame carry); only the inter (time) LSTM scans —
        and it scans K cheap steps. No per-frame serialization of the
        expensive frequency pass.

        fused=True routes each recurrence through the Pallas lstm_scan.
        dp_kernel=True (DPCRN only) replaces the WHOLE bottleneck — both
        dual-path blocks incl. projections/norms/residuals — with one
        VMEM-resident Pallas kernel (state from
        init_stream_state(dp_kernel=True)).
        """
        if mk_kernel:
            # center-fused masker kernel: d4 conv + both dual-path blocks
            # + u0 transpose conv in ONE Pallas call (state from
            # init_stream_state(mk_kernel=True)); XLA keeps the cheap
            # outer layers (d0-d3, u1-u4)
            n = self._n_cnn
            h3, skips, new_down = self._stream_down(x, state,
                                                    n_layers=n - 1)
            y0, d4c, u0h, u0s, h1, c1, h2, c2 = self.center_kernel_chunk(
                h3, state, interpret=interpret, b_tile=dp_b_tile,
                int8_hh=int8_hh, xscr_half=xscr_half)
            skips = skips + [None]  # u0's skip lives inside the kernel
            mask, new_up, _ = self._stream_up(y0, skips, state, start=1)
            return mask, dict(state, down=new_down, up=new_up,
                              d4c=d4c, u0h=u0h, u0s=u0s,
                              h1=h1, c1=c1, h2=h2, c2=c2)
        h, skips, new_down = self._stream_down(x, state)
        if dp_kernel:
            h, h1, c1, h2, c2 = self.bottleneck_kernel_chunk(
                h, state, interpret=interpret, b_tile=dp_b_tile,
                int8_hh=int8_hh, xscr_half=xscr_half)
        else:
            kw = {"attn_kernel": True} if attn_kernel else {}
            h, h1, c1 = self.dprnn_block1.step_chunk(
                h, state["h1"], state["c1"], fused=fused, **kw)
            h, h2, c2 = self.dprnn_block2.step_chunk(
                h, state["h2"], state["c2"], fused=fused, **kw)
        mask, new_up, new_skipq = self._stream_up(h, skips, state)
        new_state = dict(state, down=new_down, up=new_up,
                         h1=h1, c1=c1, h2=h2, c2=c2)
        if self.transpose_delay:
            new_state["skipq"] = new_skipq
        return mask, new_state

    def _center_conv_weights(self):
        """BN-folded d4/u0 conv weights for ops/masker_kernel.center_chunk.

        Wd[s*3+df]: d4 (cnn_down[4], [CH, Ci, 3, 2]) tap (df, dt=s),
        transposed to [Ci, CH]. Wh/Ws[s*3+df]: u0 (cnn_up[0],
        torch-transpose layout [2CH, Co, 3, 2]) h/skip halves, time taps
        flipped (slot s multiplies input frame k-1+s; see
        masker_kernel._dense_conv_matrix).
        """
        def bn_affine(norm):
            v = norm.variables
            g = v["params"]["scale"]
            b = v["params"]["bias"]
            mu = v["batch_stats"]["mean"]
            rstd = jnp.reciprocal(jnp.sqrt(v["batch_stats"]["var"]
                                           + norm.eps))
            return g * rstd, b - mu * g * rstd

        wd = self.cnn_down[-1].variables["params"]["w"]    # [CH, Ci, 3, 2]
        bd = self.cnn_down[-1].variables["params"]["b"]
        gd, betad = bn_affine(self.down_norm[-1])
        wd = wd * gd[:, None, None, None]
        bd = bd * gd + betad
        Wd = [jnp.transpose(wd[:, :, df, s])                 # [Ci, CH]
              for s in range(2) for df in range(3)]
        alpha_d = self.down_act[-1].alpha

        wu = self.cnn_up[0].variables["params"]["w"]       # [2CH, Co, 3, 2]
        bu = self.cnn_up[0].variables["params"]["b"]
        gu, betau = bn_affine(self.up_norm[0])
        wu = wu * gu[None, :, None, None]
        bu = bu * gu + betau
        CH = wu.shape[0] // 2
        Wh = [wu[:CH, :, df, 1 - s] for s in range(2) for df in range(3)]
        Ws = [wu[CH:, :, df, 1 - s] for s in range(2) for df in range(3)]
        alpha_u = self.up_act[0].alpha
        return (tuple(Wd), bd, alpha_d, tuple(Wh), tuple(Ws), bu, alpha_u)
