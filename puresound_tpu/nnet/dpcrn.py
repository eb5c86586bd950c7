"""DPCRN: Unet + dual-path (freq-BiLSTM / time-uniLSTM) bottleneck.

Parity: puresound/nnet/dpcrn.py (DPRNNblock2D :11, DPCRN :84).

TPU-first: the intra (frequency) pass batches N*T frames through one
bidirectional scan over F; the inter (time) pass batches N*F bins through
one causal scan over T.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .lobe.norm import LayerNormLast
from .lobe.rnn import SingleRNN
from .lobe.trivial import spectral_compression
from .unet import Unet
from .dual_path_streaming import DualPathStreaming


class DPRNNblock2D(nn.Module):
    """Dual-path block on [N, CH, F, T]: intra = BiLSTM over freq per frame,
    inter = uni-LSTM over time per frequency bin."""

    input_size: int
    hidden_size: int
    dropout: float = 0.0

    def setup(self):
        self.intra_rnn = SingleRNN("LSTM", self.input_size, self.hidden_size,
                                   bidirectional=True, dropout=self.dropout)
        self.intra_norm = LayerNormLast(self.input_size)
        self.inter_rnn = SingleRNN("LSTM", self.input_size, self.hidden_size,
                                   bidirectional=False, dropout=self.dropout)
        self.inter_norm = LayerNormLast(self.input_size)

    def __call__(self, x: jnp.ndarray, intra_skip: bool = True,
                 inter_skip: bool = True, train: bool = False) -> jnp.ndarray:
        N, CH, F, T = x.shape
        res = x
        # intra: frequency-dependent, time-independent
        h = x.transpose(0, 3, 2, 1).reshape(N * T, F, CH)  # [N*T, F, CH]
        h = self.intra_rnn(jnp.swapaxes(h, 1, 2), train=train)  # [N*T, CH, F]
        h = self.intra_norm(jnp.swapaxes(h, 1, 2))  # [N*T, F, CH]
        h = h.reshape(N, T, F, CH).transpose(0, 3, 2, 1)
        if intra_skip:
            h = res + h

        res = h
        # inter: time-dependent, frequency-independent
        y = h.transpose(0, 2, 3, 1).reshape(N * F, T, CH)
        y = self.inter_rnn(jnp.swapaxes(y, 1, 2), train=train)  # [N*F, CH, T]
        y = self.inter_norm(jnp.swapaxes(y, 1, 2))  # [N*F, T, CH]
        y = y.reshape(N, F, T, CH).transpose(0, 3, 1, 2)
        if inter_skip:
            y = res + y
        return y

    def step_chunk(self, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                   fused: bool = False):
        """Streaming chunk step. x: [B, CH, F, K]; the inter (time) LSTM
        carries (h, c) of shape [1, B, F, hidden]. The intra (frequency)
        pass is frame-local and runs batched over all K frames; only the
        inter LSTM scans (K steps). Identical math to __call__.

        fused=True runs both recurrences through the Pallas VMEM-resident
        scan (ops/lstm_scan_kernel.py) — input projections stay as hoisted
        XLA matmuls; only the serial carry loop moves into the kernel."""
        import jax as _jax

        from ..ops.lstm_scan_kernel import lstm_scan, pick_b_tile

        interp = _jax.default_backend() == "cpu"
        N, CH, F, K = x.shape
        res = x
        hseq = x.transpose(0, 3, 2, 1).reshape(N * K, F, CH)
        if fused:
            lstm = self.intra_rnn.rnn
            Hh = self.hidden_size
            z = jnp.zeros((N * K, Hh), hseq.dtype)
            bt = pick_b_tile(N * K)
            y_f, _, _ = lstm_scan(lstm.fwd.input_proj(hseq), z, z,
                                  lstm.fwd.w_hh, b_tile=bt, interpret=interp)
            y_b, _, _ = lstm_scan(lstm.bwd.input_proj(hseq), z, z,
                                  lstm.bwd.w_hh, reverse=True, b_tile=bt,
                                  interpret=interp)
            hseq = self.intra_rnn.proj(jnp.concatenate([y_f, y_b], axis=-1))
            hseq = self.intra_norm(hseq)                  # [N*K, F, CH]
        else:
            hseq = self.intra_rnn(jnp.swapaxes(hseq, 1, 2))   # [N*K, CH, F]
            hseq = self.intra_norm(jnp.swapaxes(hseq, 1, 2))  # [N*K, F, CH]
        x = res + hseq.reshape(N, K, F, CH).transpose(0, 3, 2, 1)

        res = x
        seq = x.transpose(0, 2, 3, 1).reshape(N * F, K, CH)
        hc_shape, hc_dtype = h.shape, h.dtype  # [1, B, F, H]
        # scan carry must match the sequence dtype (see dparn.step_chunk);
        # cast back to the stored serving dtype on return (no-op when equal)
        h = h.reshape(1, N * F, -1).astype(seq.dtype)
        c = c.reshape(1, N * F, -1).astype(seq.dtype)
        if fused:
            cell = self.inter_rnn.rnn.fwd
            y, hT, cT = lstm_scan(cell.input_proj(seq), h[0], c[0],
                                  cell.w_hh, b_tile=pick_b_tile(N * F),
                                  interpret=interp)
            h, c = hT[None], cT[None]
        else:
            y, (h, c) = self.inter_rnn.rnn(seq, (h, c))
        y = self.inter_rnn.proj(y)
        y = self.inter_norm(y)
        y = y.reshape(N, F, K, CH).transpose(0, 3, 1, 2)
        return (res + y, h.reshape(hc_shape).astype(hc_dtype),
                c.reshape(hc_shape).astype(hc_dtype))


class DPCRN(DualPathStreaming, Unet):
    """Unet + 2x DPRNNblock2D bottleneck; RI input, optional spectral
    compression. Parity: dpcrn.py:84-213."""

    rnn_hidden: int = 128
    spectral_compress: bool = False

    def setup(self):
        super().setup()
        ch = self.channels[-1]
        self.dprnn_block1 = DPRNNblock2D(ch, self.rnn_hidden, self.dropout)
        self.dprnn_block2 = DPRNNblock2D(ch, self.rnn_hidden, self.dropout)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spectral_compress:
            x = spectral_compression(x, alpha=0.3, dim=1)
        x = self._pack_input(x)
        x, skips = self._down(x, train)
        x = self.dprnn_block1(x, train=train)
        x = self.dprnn_block2(x, train=train)
        x = self._up(x, skips, train)
        return self._unpack_output(x)

    # -------------------------------------------- fused bottleneck (Pallas)
    def _dp_kernel_weights(self, int8_hh: bool = False):
        """Flat weight tuple for ops/dual_path_kernel.py (both blocks).

        int8_hh=True replaces each recurrent w_hh with (int8 per-column
        quantized weights, column scales) for the kernel's int8 MXU path.
        """
        def hh(w):
            if not int8_hh:
                return [w]
            col_max = jnp.max(jnp.abs(w), axis=0).clip(1e-8)
            return [jnp.clip(jnp.round(w / col_max * 127.0),
                             -127, 127).astype(jnp.int8), col_max]

        ws = []
        for blk in (self.dprnn_block1, self.dprnn_block2):
            H = blk.hidden_size
            lstm = blk.intra_rnn.rnn
            pk = blk.intra_rnn.proj.variables["params"]["kernel"]   # [2H, CH]
            pb = blk.intra_rnn.proj.variables["params"]["bias"]
            ln = blk.intra_norm.variables["params"]
            inter = blk.inter_rnn.rnn.fwd
            ipk = blk.inter_rnn.proj.variables["params"]["kernel"]  # [H, CH]
            ipb = blk.inter_rnn.proj.variables["params"]["bias"]
            iln = blk.inter_norm.variables["params"]
            ws += ([lstm.fwd.w_ih] + hh(lstm.fwd.w_hh)
                   + [lstm.fwd.b_ih + lstm.fwd.b_hh]
                   + [lstm.bwd.w_ih] + hh(lstm.bwd.w_hh)
                   + [lstm.bwd.b_ih + lstm.bwd.b_hh]
                   + [pk[:H], pk[H:], pb, ln["scale"], ln["bias"]]
                   + [inter.w_ih] + hh(inter.w_hh)
                   + [inter.b_ih + inter.b_hh,
                      ipk, ipb, iln["scale"], iln["bias"]])
        return tuple(ws)

    def bottleneck_kernel_chunk(self, x: jnp.ndarray, state: dict,
                                interpret: bool = False,
                                b_tile: int = 0, int8_hh: bool = False,
                                xscr_half: bool = False,
                                sub_tiles: int = 1):
        """Both dual-path blocks through the VMEM-resident Pallas kernel.

        x: [B, CH, F, K] -> (y [B, CH, F, K], new h1/c1/h2/c2). Requires the
        kernel-native inter-carry layout ([F, B, H] per block —
        init_stream_state(dp_kernel=True)).
        """
        import jax as _jax

        from ..ops.dual_path_kernel import dual_path_chunk

        interpret = interpret or _jax.default_backend() == "cpu"
        B = x.shape[0]
        xt = x.transpose(2, 3, 0, 1)  # [F, K, B, CH]
        dot_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        if not b_tile:
            # 128 streams/tile (x2 frames = 256 rows/scan step) fits the
            # 100 MB scoped-VMEM budget with the chunked proj/inter
            # temporaries (unchunked needed ~104 MB); xscr_half (bf16
            # residual scratch) makes room for 256-stream tiles, halving
            # the serial grid
            tiles = (256, 128, 64, 32, 16, 8, 4, 2, 1) if xscr_half \
                else (128, 64, 32, 16, 8, 4, 2, 1)
            b_tile = next(t for t in tiles
                          if B % (t * sub_tiles) == 0 and t * sub_tiles <= B)
        y, h_out, c_out = dual_path_chunk(
            xt, [state["h1"], state["h2"]], [state["c1"], state["c2"]],
            self._dp_kernel_weights(int8_hh), b_tile=b_tile,
            interpret=interpret, dot_dtype=dot_dtype, int8_hh=int8_hh,
            xscr_half=xscr_half, sub_tiles=sub_tiles)
        return (y.transpose(2, 3, 0, 1), h_out[0], c_out[0],
                h_out[1], c_out[1])

    # --------------------------------------- center-fused masker (Pallas)
    def center_kernel_chunk(self, x: jnp.ndarray, state: dict,
                            interpret: bool = False, b_tile: int = 0,
                            int8_hh: bool = False, xscr_half: bool = False):
        """The six stride-1 inner layers (d_{n-3}..d_{n-1} convs, both
        dual-path blocks, u0..u2 transpose convs) through the wide-center
        Pallas kernel (ops/masker_kernel.py).

        x: [B, C, F, K] (down layer n-4 output) -> (y [B, C', F, K] — up
        layer 2 output, new dc/u0h/u0s/u1h/u2h conv carries, new
        h1/c1/h2/c2). Needs mk_kernel streaming state
        (init_stream_state(mk_kernel=True))."""
        import jax as _jax

        from ..ops.masker_kernel import center_chunk

        interpret = interpret or _jax.default_backend() == "cpu"
        B = x.shape[0]
        xt = x.transpose(2, 3, 0, 1)  # [F, K, B, C]
        dot_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        if not b_tile:
            from ..ops.masker_kernel import pick_center_tile

            chans = (x.shape[1], state["dc"][1].shape[-1],
                     state["dc"][2].shape[-1], state["u1h"].shape[-1],
                     state["u0h"].shape[-1], state["u2h"].shape[-1])
            b_tile = pick_center_tile(
                B, x.shape[2], x.shape[3], chans,
                state["h1"].shape[-1],
                bf16=(x.dtype == jnp.bfloat16), xscr_half=xscr_half,
                n_extra_scr=2)
        y, dc, u0h, u0s, u1h, u2h, h_out, c_out = center_chunk(
            xt, state["dc"], state["u0h"], state["u0s"],
            state["u1h"], state["u2h"],
            [state["h1"], state["h2"]], [state["c1"], state["c2"]],
            self._mk_conv_weights(), self._dp_kernel_weights(int8_hh),
            b_tile=b_tile, interpret=interpret, dot_dtype=dot_dtype,
            int8_hh=int8_hh, xscr_half=xscr_half)
        return (y.transpose(2, 3, 0, 1), dc, u0h, u0s, u1h, u2h,
                h_out[0], c_out[0], h_out[1], c_out[1])


