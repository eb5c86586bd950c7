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
        mk_kernel=True (causal only) is the wide-center masker kernel
        layout: the kernel owns the six stride-1 inner layers
        (d_{n-3}..d_{n-1}, u0..u2) with kernel-native [F, B, C] carries
        (down in-carries dc0..dc2 — doubling as the up skip carries —
        plus the up h-carries u0h/u1h/u2h and the u0 skip u0s); XLA
        keeps the stride-2 edge layers with stock carries."""
        Fb = self._stream_freqs()[-1]
        H = self.rnn_hidden
        if mk_kernel:
            assert not self.transpose_delay, \
                "mk_kernel supports causal configs only"
            assert self.causal_streamable()
            freqs, chans, n = self._stream_freqs(), self._chans, self._n_cnn
            assert n >= 4 and all(
                self.stride_f[i] == 1 and self.kernel_f[i] == 3
                and freqs[i] == Fb for i in range(n - 3, n)), \
                "mk_kernel needs 3 stride-1 k_f-3 inner down layers"
            state = {
                "down": [jnp.zeros((batch, chans[i], freqs[i]), dtype)
                         for i in range(n - 3)],
                "up": [jnp.zeros((batch, 2 * chans[n - j], freqs[n - j]),
                                 dtype) for j in range(3, n)],
                "dc": [jnp.zeros((Fb, batch, chans[i]), dtype)
                       for i in range(n - 3, n)],
                "u0h": jnp.zeros((Fb, batch, chans[n]), dtype),
                "u0s": jnp.zeros((Fb, batch, chans[n]), dtype),
                "u1h": jnp.zeros((Fb, batch, chans[n - 1]), dtype),
                "u2h": jnp.zeros((Fb, batch, chans[n - 2]), dtype),
            }
        else:
            state = self._init_unet_stream_state(batch, dtype)
        if dp_kernel or mk_kernel:
            carry = lambda: jnp.zeros((Fb, batch, H), dtype)
        else:
            # [1, B, F, H] — slot axis explicit (size-based per-slot state
            # resets, e.g. SessionServer, must be able to find B); the
            # step reshapes to the LSTM's [1, B*F, H] rows for free
            carry = lambda: jnp.zeros((1, batch, Fb, H), dtype)
        state.update(h1=carry(), c1=carry(), h2=carry(), c2=carry())
        return state

    def stream_frames(self, x: jnp.ndarray, state: dict,
                      fused: bool = False, dp_kernel: bool = False,
                      interpret: bool = False, dp_b_tile: int = 0,
                      int8_hh: bool = False, attn_kernel: bool = False,
                      xscr_half: bool = False, mk_kernel: bool = False,
                      dp_sub_tiles: int = 1):
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
            # wide-center masker kernel: the six stride-1 inner layers
            # (d_{n-3}..d_{n-1} convs, the whole bottleneck, u0..u2
            # transpose convs with their skips) in ONE Pallas call (state
            # from init_stream_state(mk_kernel=True)); XLA keeps only the
            # cheap stride-2 edge layers (d0..d_{n-4}, u_{n-2}..u_{n-1})
            n = self._n_cnn
            hin, skips, new_down = self._stream_down(x, state,
                                                     n_layers=n - 3)
            (y2, dc, u0h, u0s, u1h, u2h,
             h1, c1, h2, c2) = self.center_kernel_chunk(
                hin, state, interpret=interpret, b_tile=dp_b_tile,
                int8_hh=int8_hh, xscr_half=xscr_half)
            skips = skips + [None] * 3  # the fused layers' skips live
            mask, new_up, _ = self._stream_up(y2, skips, state, start=3)
            return mask, dict(state, down=new_down, up=new_up,
                              dc=dc, u0h=u0h, u0s=u0s, u1h=u1h, u2h=u2h,
                              h1=h1, c1=c1, h2=h2, c2=c2)
        h, skips, new_down = self._stream_down(x, state)
        if dp_kernel:
            h, h1, c1, h2, c2 = self.bottleneck_kernel_chunk(
                h, state, interpret=interpret, b_tile=dp_b_tile,
                int8_hh=int8_hh, xscr_half=xscr_half,
                sub_tiles=dp_sub_tiles)
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

    def _mk_conv_weights(self):
        """BN-folded conv weights of the six fused inner layers for the
        wide-center masker kernel (ops/masker_kernel._wide_call prep
        order): down layers n-3..n-1 as (W[6] of [C_i, C_{i+1}] — tap
        (df, dt=s) transposed), then up layers 0..2 as (Wh[6], Ws[6] of
        [C_h, C_out] — torch-transpose layout halves, time taps flipped:
        slot s multiplies input frame k-1+s, see
        masker_kernel._dense_conv_matrix), each followed by its folded
        bias and PReLU alpha."""
        def bn_affine(norm):
            v = norm.variables
            g = v["params"]["scale"]
            b = v["params"]["bias"]
            mu = v["batch_stats"]["mean"]
            rstd = jnp.reciprocal(jnp.sqrt(v["batch_stats"]["var"]
                                           + norm.eps))
            return g * rstd, b - mu * g * rstd

        n = self._n_cnn
        out = []
        for i in range(n - 3, n):
            wd = self.cnn_down[i].variables["params"]["w"]  # [Co, Ci, 3, 2]
            bd = self.cnn_down[i].variables["params"]["b"]
            g, beta = bn_affine(self.down_norm[i])
            wd = wd * g[:, None, None, None]
            bd = bd * g + beta
            out += [jnp.transpose(wd[:, :, df, sl])          # [Ci, Co]
                    for sl in range(2) for df in range(3)]
            out += [bd, self.down_act[i].alpha]
        for j in range(3):
            wu = self.cnn_up[j].variables["params"]["w"]     # [2C, Co, 3, 2]
            bu = self.cnn_up[j].variables["params"]["b"]
            g, beta = bn_affine(self.up_norm[j])
            wu = wu * g[None, :, None, None]
            bu = bu * g + beta
            C = wu.shape[0] // 2
            out += [wu[:C, :, df, 1 - sl]
                    for sl in range(2) for df in range(3)]
            out += [wu[C:, :, df, 1 - sl]
                    for sl in range(2) for df in range(3)]
            out += [bu, self.up_act[j].alpha]
        return tuple(out)
