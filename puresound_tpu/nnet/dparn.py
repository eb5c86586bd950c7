"""DPARN: DPCRN with the intra (frequency) LSTM replaced by self-attention.

Parity: puresound/nnet/dparn.py (DPARNblock2D :12, DPARN :110,
DPARN_Mout :249).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .lobe.attention import MhaSelfAttenLayer
from .lobe.norm import LayerNormLast
from .lobe.rnn import SingleRNN
from .lobe.trivial import spectral_compression
from .unet import Unet
from .dual_path_streaming import DualPathStreaming


class DPARNblock2D(nn.Module):
    """Intra = 2x MHA self-attention over freq + FC; inter = uni-LSTM over
    time. x: [N, CH, F, T]."""

    input_size: int
    hidden_size: int
    nhead: int
    dropout: float = 0.0

    def setup(self):
        self.intra_atten1 = MhaSelfAttenLayer(
            self.input_size, self.hidden_size, nhead=self.nhead,
            dropout=self.dropout, improved=False, bidirectional=False,
            position_encoding=True)
        self.intra_atten2 = MhaSelfAttenLayer(
            self.input_size, self.hidden_size, nhead=self.nhead,
            dropout=self.dropout, improved=False, bidirectional=False,
            position_encoding=False)
        self.intra_fc = nn.Dense(self.input_size)
        self.intra_norm = LayerNormLast(self.input_size)
        self.inter_rnn = SingleRNN("LSTM", self.input_size, self.hidden_size,
                                   bidirectional=False, dropout=self.dropout)
        self.inter_norm = LayerNormLast(self.input_size)

    def __call__(self, x: jnp.ndarray, intra_skip: bool = True,
                 inter_skip: bool = True, train: bool = False) -> jnp.ndarray:
        N, CH, F, T = x.shape
        res = x
        h = x.transpose(0, 3, 2, 1).reshape(N * T, F, CH)  # [N*T, F, CH]
        h = self.intra_atten1(jnp.swapaxes(h, 1, 2), causal=False, train=train)
        h = self.intra_atten2(h, causal=False, train=train)  # [N*T, CH, F]
        h = jnp.swapaxes(h, 1, 2)  # [N*T, F, CH]
        h = self.intra_norm(self.intra_fc(h))
        h = h.reshape(N, T, F, CH).transpose(0, 3, 2, 1)
        if intra_skip:
            h = res + h

        res = h
        y = h.transpose(0, 2, 3, 1).reshape(N * F, T, CH)
        y = self.inter_rnn(jnp.swapaxes(y, 1, 2), train=train)
        y = self.inter_norm(jnp.swapaxes(y, 1, 2))
        y = y.reshape(N, F, T, CH).transpose(0, 3, 1, 2)
        if inter_skip:
            y = res + y
        return y

    def _attn_kernel_weights(self):
        """Flat weight tuple for ops/dparn_attention_kernel.py (both
        encoder layers + final FC/norm; projections pre-transposed)."""
        ws = []
        for att in (self.intra_atten1, self.intra_atten2):
            wq, wk, wv = jnp.split(att.self_atten.in_proj, 3, axis=0)
            ws += [wq.T, wk.T, wv.T, att.self_atten.out_proj.T]
            ws += [att.norm1.variables["params"]["scale"],
                   att.norm1.variables["params"]["bias"],
                   att.ff1.variables["params"]["kernel"],
                   att.ff1.variables["params"]["bias"],
                   att.ff2.variables["params"]["kernel"],
                   att.ff2.variables["params"]["bias"],
                   att.norm2.variables["params"]["scale"],
                   att.norm2.variables["params"]["bias"]]
        ws += [self.intra_fc.variables["params"]["kernel"],
               self.intra_fc.variables["params"]["bias"],
               self.intra_norm.variables["params"]["scale"],
               self.intra_norm.variables["params"]["bias"]]
        return tuple(ws)

    def step_chunk(self, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                   fused: bool = False, attn_kernel: bool = False,
                   interpret: bool = False):
        """Streaming chunk step. The intra self-attention runs over the
        FREQUENCY axis (frame-local) batched over all K frames; only the
        inter (time) LSTM scans. x: [B, CH, F, K]; h/c: [1, B, F, hidden].
        fused=True runs the inter recurrence through the Pallas scan;
        attn_kernel=True fuses the WHOLE intra pass (both encoder layers +
        FC/norm) into one VMEM-resident Pallas program."""
        N, CH, F, K = x.shape
        res = x
        if attn_kernel:
            import jax as _jax

            from ..ops.dparn_attention_kernel import dparn_intra_pass

            rows = x.transpose(0, 3, 2, 1).reshape(N * K, F, CH)
            pe = jnp.asarray(self.intra_atten1.pos._pe[:F]).astype(rows.dtype)
            out = dparn_intra_pass(
                rows, pe, self._attn_kernel_weights(), heads=self.nhead,
                interpret=interpret or _jax.default_backend() == "cpu",
                dot_dtype=(jnp.bfloat16 if x.dtype == jnp.bfloat16
                           else jnp.float32))
            x = res + out.reshape(N, K, F, CH).transpose(0, 3, 2, 1)
        else:
            hseq = x.transpose(0, 3, 2, 1).reshape(N * K, F, CH)
            hseq = self.intra_atten1(jnp.swapaxes(hseq, 1, 2), causal=False)
            hseq = self.intra_atten2(hseq, causal=False)  # [N*K, CH, F]
            hseq = jnp.swapaxes(hseq, 1, 2)  # [N*K, F, CH]
            hseq = self.intra_norm(self.intra_fc(hseq))
            x = res + hseq.reshape(N, K, F, CH).transpose(0, 3, 2, 1)

        res = x
        seq = x.transpose(0, 2, 3, 1).reshape(N * F, K, CH)
        hc_shape, hc_dtype = h.shape, h.dtype  # [1, B, F, H]
        # carries are STORED at the serving dtype (bf16 state) but the
        # intra pass may upcast activations (f32 softmax/norms) — the scan
        # carry must match the sequence dtype; cast back for storage
        h = h.reshape(1, N * F, -1).astype(seq.dtype)
        c = c.reshape(1, N * F, -1).astype(seq.dtype)
        if fused:
            import jax as _jax

            from ..ops.lstm_scan_kernel import lstm_scan, pick_b_tile

            cell = self.inter_rnn.rnn.fwd
            y, hT, cT = lstm_scan(cell.input_proj(seq), h[0], c[0],
                                  cell.w_hh, b_tile=pick_b_tile(N * F),
                                  interpret=_jax.default_backend() == "cpu")
            h, c = hT[None], cT[None]
        else:
            y, (h, c) = self.inter_rnn.rnn(seq, (h, c))
        y = self.inter_rnn.proj(y)
        y = self.inter_norm(y)
        y = y.reshape(N, F, K, CH).transpose(0, 3, 1, 2)
        return (res + y, h.reshape(hc_shape).astype(hc_dtype),
                c.reshape(hc_shape).astype(hc_dtype))


class _DPARNBase(DualPathStreaming, Unet):
    rnn_hidden: int = 128
    nhead: int = 1
    spectral_compress: bool = False

    def setup(self):
        super().setup()
        ch = self.channels[-1]
        self.dprnn_block1 = DPARNblock2D(ch, self.rnn_hidden, self.nhead, self.dropout)
        self.dprnn_block2 = DPARNblock2D(ch, self.rnn_hidden, self.nhead, self.dropout)

    # --------------------------------------- center-fused masker (Pallas)
    def _dparn_block_weights(self):
        """Flat per-block weights for ops/masker_kernel.dparn_center_chunk
        (attention layers via _attn_kernel_weights + the inter LSTM)."""
        ws = []
        for blk in (self.dprnn_block1, self.dprnn_block2):
            ws += list(blk._attn_kernel_weights())
            inter = blk.inter_rnn.rnn.fwd
            ws += [inter.w_ih, inter.w_hh, inter.b_ih + inter.b_hh,
                   blk.inter_rnn.proj.variables["params"]["kernel"],
                   blk.inter_rnn.proj.variables["params"]["bias"],
                   blk.inter_norm.variables["params"]["scale"],
                   blk.inter_norm.variables["params"]["bias"]]
        return tuple(ws)

    def center_kernel_chunk(self, x: jnp.ndarray, state: dict,
                            interpret: bool = False, b_tile: int = 0,
                            int8_hh: bool = False, xscr_half: bool = False):
        """The six stride-1 inner layers with the DPARN bottleneck
        (attention intra + inter LSTM) through the wide-center Pallas
        kernel; same contract as DPCRN.center_kernel_chunk."""
        import jax as _jax

        from ..ops.masker_kernel import dparn_center_chunk

        assert not int8_hh, "int8_hh is not supported on the DPARN kernel"
        interpret = interpret or _jax.default_backend() == "cpu"
        B = x.shape[0]
        Fb = self._stream_freqs()[-1]
        xt = x.transpose(2, 3, 0, 1)  # [F, K, B, C]
        pe = jnp.asarray(
            self.dprnn_block1.intra_atten1.pos._pe[:Fb]).astype(jnp.float32)
        dot_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        if not b_tile:
            from ..ops.masker_kernel import pick_center_tile

            chans = (x.shape[1], state["dc"][1].shape[-1],
                     state["dc"][2].shape[-1], state["u1h"].shape[-1],
                     state["u0h"].shape[-1], state["u2h"].shape[-1])
            b_tile = pick_center_tile(
                B, x.shape[2], x.shape[3], chans,
                state["h1"].shape[-1],
                bf16=(x.dtype == jnp.bfloat16), xscr_half=xscr_half)
        y, dc, u0h, u0s, u1h, u2h, h_out, c_out = dparn_center_chunk(
            xt, pe, state["dc"], state["u0h"], state["u0s"],
            state["u1h"], state["u2h"],
            [state["h1"], state["h2"]], [state["c1"], state["c2"]],
            self._mk_conv_weights(), self._dparn_block_weights(),
            heads=self.nhead, b_tile=b_tile, interpret=interpret,
            dot_dtype=dot_dtype, xscr_half=xscr_half)
        return (y.transpose(2, 3, 0, 1), dc, u0h, u0s, u1h, u2h,
                h_out[0], c_out[0], h_out[1], c_out[1])

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spectral_compress:
            x = spectral_compression(x, alpha=0.3, dim=1)
        x = self._pack_input(x)
        x, skips = self._down(x, train)
        x = self.dprnn_block1(x, train=train)
        x = self.dprnn_block2(x, train=train)
        x = self._up(x, skips, train)
        return self._unpack_output(x)


class DPARN(_DPARNBase):
    """Single-output DPARN (multi_output must stay 1)."""


class DPARN_Mout(_DPARNBase):
    """Multi-output DPARN for SIMO separation (set multi_output=N)."""
