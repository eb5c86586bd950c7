"""Recurrent primitives: scan LSTM/GRU (the keystone cell), SingleRNN, FSMN.

The `LSTM` here is the single definition reused by DPRNN / SkiM offline
(lax.scan over time) and by the streaming engine (single `step`), which makes
offline <-> streaming equivalence structural rather than empirical
(SURVEY.md §7 stage 2).

TPU notes: the input projection x @ W_ih for ALL timesteps is hoisted out of
the scan as one large [B*T, C] x [C, 4H] matmul (MXU); the scan body is a
single [B, H] x [H, 4H] matmul plus elementwise gates (fused by XLA).

Parity: puresound/nnet/lobe/rnn.py (SingleRNN :9, FSMN :56,
ConditionFSMN :134); torch nn.LSTM gate order (i, f, g, o) and double-bias
parameterization are preserved so reference checkpoints map 1:1.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .norm import get_norm, apply_norm

# lax.scan unroll factor for the offline recurrences. The training step is
# scan-iteration-latency bound on TPU (each LSTM step's [B,H]x[H,4H] matmul
# is microseconds; the serial loop overhead is not) — unrolling k cell steps
# per scan iteration amortizes it without changing semantics.
SCAN_UNROLL = int(os.environ.get("PURESOUND_SCAN_UNROLL", "1"))

# Route offline LSTM recurrences through the fused Pallas training kernel
# (ops/lstm_train_kernel.py: whole scan in one kernel per pass, carry
# VMEM-resident, custom VJP with a reverse-time Pallas backward). Set by
# TRAIN.fused_scan (tasks) or PURESOUND_FUSED_SCAN=1; identical numerics
# to the lax.scan path (tests/test_pallas_kernels.py).
FUSED_TRAIN_SCAN = int(os.environ.get("PURESOUND_FUSED_SCAN", "0")) != 0

# With the fused scan on, additionally run the input projection (and its
# gradient) INSIDE the kernels (lstm_scan_train_fp): the [B, T, 4H] xp
# tensor and its cotangent never reach HBM (~275 MB per SkiM block per
# pass at flagship training shapes on an HBM-bound step) — the extra
# per-step MXU matmul is nearly free in the VPU-bound body. Exact vs the
# hoisted path (tests/test_pallas_kernels.py fused_proj tests).
FUSED_PROJ_SCAN = int(os.environ.get("PURESOUND_FUSED_PROJ", "1")) != 0


def _unroll(T: int) -> int:
    u = SCAN_UNROLL
    while u > 1 and T % u:
        u //= 2
    return max(u, 1)


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)
    return init


class LSTMCellParams(nn.Module):
    """One direction of a single-layer LSTM (torch-compatible params)."""

    in_features: int
    hidden: int

    def setup(self):
        k = 1.0 / np.sqrt(self.hidden)
        self.w_ih = self.param("w_ih", _uniform_init(k), (self.in_features, 4 * self.hidden))
        self.w_hh = self.param("w_hh", _uniform_init(k), (self.hidden, 4 * self.hidden))
        self.b_ih = self.param("b_ih", _uniform_init(k), (4 * self.hidden,))
        self.b_hh = self.param("b_hh", _uniform_init(k), (4 * self.hidden,))

    def input_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Hoisted input projection for a whole sequence. x: [..., C] -> [..., 4H]."""
        return x @ self.w_ih + self.b_ih + self.b_hh

    def gates_step(self, xp_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        """One recurrence step from a pre-projected input. All [B, *]."""
        gates = xp_t + h @ self.w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def step(self, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        """One step from a raw input. x_t: [B, C]."""
        return self.gates_step(self.input_proj(x_t), h, c)

    def scan(self, x: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray, reverse: bool = False):
        """Run over a sequence. x: [B, T, C] -> (y [B, T, H], (hT, cT))."""
        # measured crossover: at <256 rows the per-kernel overhead loses to
        # lax.scan (B=8 flagship: 19 ms fused vs 10 ms stock); at 896 rows
        # the fused path wins 66 -> 50 ms
        if (FUSED_TRAIN_SCAN and x.shape[0] >= 256 and x.shape[1] >= 8
                and self.hidden % 8 == 0):
            import jax as _jax

            dd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
            interp = _jax.default_backend() != "tpu"
            if FUSED_PROJ_SCAN and self.in_features % 8 == 0:
                from ...ops.lstm_train_kernel import lstm_scan_train_fp

                # projection fused into the kernels: xp/dxp never reach HBM
                y, hT, cT = lstm_scan_train_fp(
                    x, h0, c0, self.w_ih, self.b_ih + self.b_hh, self.w_hh,
                    reverse, 0, interp, dd)
                return y, (hT, cT)

            from ...ops.lstm_train_kernel import lstm_scan_train

            # batch-major entry: the [B,T,4H]<->[T,B,4H] swaps around the
            # kernel FUSE into the projection matmul's output layout (a
            # time-major caller that transposes raw x instead measured
            # +0.6 ms — the x transpose materializes as a Pallas operand)
            y, hT, cT = lstm_scan_train(
                self.input_proj(x), h0, c0, self.w_hh, reverse, 0,
                interp, dd)
            return y, (hT, cT)
        xp = self.input_proj(x)  # [B, T, 4H]
        xp_t = jnp.swapaxes(xp, 0, 1)  # [T, B, 4H]

        def body(carry, xt):
            h, c = carry
            h, c = self.gates_step(xt, h, c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(body, (h0, c0), xp_t, reverse=reverse,
                                    unroll=_unroll(xp_t.shape[0]))
        return jnp.swapaxes(ys, 0, 1), (hT, cT)

    def scan_tm(self, x_t: jnp.ndarray, h0, c0, reverse: bool = False):
        """TIME-MAJOR scan: x_t [T, B, C] -> (y_t [T, B, H], (hT, cT)).

        The kernel-native layout end to end — a time-major caller (the
        SkiM TM_BLOCKS stack) pays no [B,T]<->[T,B] materializations
        around the fused-projection kernel (its batch-major wrapper's
        swaps are real HBM copies now that the projection lives inside
        the kernel and can no longer absorb them)."""
        if (FUSED_TRAIN_SCAN and FUSED_PROJ_SCAN and x_t.shape[1] >= 256
                and x_t.shape[0] >= 8 and self.hidden % 8 == 0
                and self.in_features % 8 == 0):
            import jax as _jax

            from ...ops.lstm_train_kernel import lstm_scan_train_fp_tm

            dd = jnp.bfloat16 if x_t.dtype == jnp.bfloat16 else jnp.float32
            y_t, hT, cT = lstm_scan_train_fp_tm(
                x_t, h0, c0, self.w_ih, self.b_ih + self.b_hh, self.w_hh,
                reverse, 0, _jax.default_backend() != "tpu", dd)
            return y_t, (hT, cT)
        xp_t = self.input_proj(x_t)  # [T, B, 4H], already time-major

        def body(carry, xt):
            h, c = carry
            h, c = self.gates_step(xt, h, c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(body, (h0, c0), xp_t, reverse=reverse,
                                    unroll=_unroll(xp_t.shape[0]))
        return ys, (hT, cT)


class LSTM(nn.Module):
    """Single-layer (optionally bidirectional) LSTM, batch-first.

    __call__(x [B, T, C], init=None) -> (y [B, T, D*H], (h [D,B,H], c [D,B,H]))
    """

    in_features: int
    hidden: int
    bidirectional: bool = False

    def setup(self):
        self.fwd = LSTMCellParams(self.in_features, self.hidden)
        if self.bidirectional:
            self.bwd = LSTMCellParams(self.in_features, self.hidden)

    @property
    def num_directions(self):
        return 2 if self.bidirectional else 1

    def __call__(self, x: jnp.ndarray,
                 init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        B = x.shape[0]
        if init is None:
            h0 = jnp.zeros((self.num_directions, B, self.hidden), x.dtype)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = init
        y_f, (hf, cf) = self.fwd.scan(x, h0[0], c0[0])
        if not self.bidirectional:
            return y_f, (hf[None], cf[None])
        y_b, (hb, cb) = self.bwd.scan(x, h0[1], c0[1], reverse=True)
        y = jnp.concatenate([y_f, y_b], axis=-1)
        return y, (jnp.stack([hf, hb]), jnp.stack([cf, cb]))

    def call_tm(self, x_t: jnp.ndarray,
                init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        """Time-major __call__: x_t [T, B, C] -> (y_t [T, B, D*H], (h, c)).

        Same math as __call__ in the kernel-native layout (see
        LSTMCellParams.scan_tm)."""
        B = x_t.shape[1]
        if init is None:
            h0 = jnp.zeros((self.num_directions, B, self.hidden), x_t.dtype)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = init
        y_f, (hf, cf) = self.fwd.scan_tm(x_t, h0[0], c0[0])
        if not self.bidirectional:
            return y_f, (hf[None], cf[None])
        y_b, (hb, cb) = self.bwd.scan_tm(x_t, h0[1], c0[1], reverse=True)
        y = jnp.concatenate([y_f, y_b], axis=-1)
        return y, (jnp.stack([hf, hb]), jnp.stack([cf, cb]))

    def step(self, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        """Single-frame step (uni-directional only). x_t: [B, C], h/c: [1, B, H]."""
        if self.bidirectional:
            raise ValueError("step() is only defined for uni-directional LSTM")
        h1, c1 = self.fwd.step(x_t, h[0], c[0])
        return h1, (h1[None], c1[None])


class GRUCellParams(nn.Module):
    """One direction of a single-layer GRU (torch gate order r, z, n)."""

    in_features: int
    hidden: int

    def setup(self):
        k = 1.0 / np.sqrt(self.hidden)
        self.w_ih = self.param("w_ih", _uniform_init(k), (self.in_features, 3 * self.hidden))
        self.w_hh = self.param("w_hh", _uniform_init(k), (self.hidden, 3 * self.hidden))
        self.b_ih = self.param("b_ih", _uniform_init(k), (3 * self.hidden,))
        self.b_hh = self.param("b_hh", _uniform_init(k), (3 * self.hidden,))

    def scan(self, x, h0, reverse: bool = False):
        xp = x @ self.w_ih + self.b_ih  # [B, T, 3H]
        xp_t = jnp.swapaxes(xp, 0, 1)

        def body(h, xt):
            hp = h @ self.w_hh + self.b_hh
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        hT, ys = jax.lax.scan(body, h0, xp_t, reverse=reverse,
                              unroll=_unroll(xp_t.shape[0]))
        return jnp.swapaxes(ys, 0, 1), hT


class VanillaRNNCellParams(nn.Module):
    """Elman RNN with tanh (torch nn.RNN default)."""

    in_features: int
    hidden: int

    def setup(self):
        k = 1.0 / np.sqrt(self.hidden)
        self.w_ih = self.param("w_ih", _uniform_init(k), (self.in_features, self.hidden))
        self.w_hh = self.param("w_hh", _uniform_init(k), (self.hidden, self.hidden))
        self.b_ih = self.param("b_ih", _uniform_init(k), (self.hidden,))
        self.b_hh = self.param("b_hh", _uniform_init(k), (self.hidden,))

    def scan(self, x, h0, reverse: bool = False):
        xp = x @ self.w_ih + self.b_ih + self.b_hh
        xp_t = jnp.swapaxes(xp, 0, 1)

        def body(h, xt):
            h_new = jnp.tanh(xt + h @ self.w_hh)
            return h_new, h_new

        hT, ys = jax.lax.scan(body, h0, xp_t, reverse=reverse,
                              unroll=_unroll(xp_t.shape[0]))
        return jnp.swapaxes(ys, 0, 1), hT


class SingleRNN(nn.Module):
    """1-layer RNN/LSTM/GRU + dropout + linear projection back to input size.

    [N, C, T] in/out. Parity: puresound/nnet/lobe/rnn.py:9-53.
    """

    rnn_type: str
    input_size: int
    hidden_size: int
    bidirectional: bool = False
    dropout: float = 0.0

    def setup(self):
        rt = self.rnn_type.upper()
        if rt not in ("RNN", "LSTM", "GRU"):
            raise ValueError(f"unsupported rnn type {self.rnn_type}")
        self._rt = rt
        D = 2 if self.bidirectional else 1
        if rt == "LSTM":
            self.rnn = LSTM(self.input_size, self.hidden_size, self.bidirectional)
        elif rt == "GRU":
            self.cell_f = GRUCellParams(self.input_size, self.hidden_size)
            if self.bidirectional:
                self.cell_b = GRUCellParams(self.input_size, self.hidden_size)
        else:
            self.cell_f = VanillaRNNCellParams(self.input_size, self.hidden_size)
            if self.bidirectional:
                self.cell_b = VanillaRNNCellParams(self.input_size, self.hidden_size)
        self.proj = nn.Dense(self.input_size,
                             kernel_init=_uniform_init(1.0 / np.sqrt(D * self.hidden_size)),
                             bias_init=_uniform_init(1.0 / np.sqrt(D * self.hidden_size)))
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [N, C, T] -> [N, C, T]."""
        h = jnp.swapaxes(x, 1, 2)  # [N, T, C]
        B = h.shape[0]
        if self._rt == "LSTM":
            y, _ = self.rnn(h)
        else:
            h0 = jnp.zeros((B, self.hidden_size), h.dtype)
            y_f, _ = self.cell_f.scan(h, h0)
            if self.bidirectional:
                y_b, _ = self.cell_b.scan(h, h0, reverse=True)
                y = jnp.concatenate([y_f, y_b], axis=-1)
            else:
                y = y_f
        y = self.drop(y, deterministic=not train)
        y = self.proj(y)
        return jnp.swapaxes(y, 1, 2)

    def step(self, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        """Streaming single-frame step (uni-directional LSTM only).

        x_t: [B, C], h/c: [1, B, H] -> (y [B, C], h', c')."""
        assert self._rt == "LSTM" and not self.bidirectional
        y, (h, c) = self.rnn.step(x_t, h, c)
        return self.proj(y), h, c


class FSMN(nn.Module):
    """Feedforward sequential memory network layer.

    (x [N,C,T], memory [N,P,T]) -> (out [N,C,T], new memory [N,P,T]).
    Parity: puresound/nnet/lobe/rnn.py:56-131.
    """

    input_dim: int
    output_dim: int
    project_dim: int
    l_context: int
    r_context: int
    dilation: int = 1
    dropout: float = 0.0
    norm_type: str = "bN1d"

    def setup(self):
        k_in = 1.0 / np.sqrt(self.input_dim)
        self.in_proj_w = self.param("in_proj_w", _uniform_init(k_in),
                                    (self.project_dim, self.input_dim, 1))
        ksize = self.l_context + self.r_context + 1
        k_ctx = 1.0 / np.sqrt(ksize)
        self.ctx_w = self.param("ctx_w", _uniform_init(k_ctx),
                                (self.project_dim, 1, ksize))
        k_out = 1.0 / np.sqrt(self.project_dim)
        self.out_proj_w = self.param("out_proj_w", _uniform_init(k_out),
                                     (self.output_dim, self.project_dim, 1))
        self.out_proj_b = self.param("out_proj_b", _uniform_init(k_out),
                                     (self.output_dim,))
        self.out_norm = get_norm(self.norm_type)(self.output_dim)
        self.drop = nn.Dropout(self.dropout)

    def _project_in(self, x):
        return jnp.einsum("nct,pc->npt", x, self.in_proj_w[:, :, 0])

    def _context(self, proj):
        pad = jnp.pad(proj, ((0, 0), (0, 0), (self.l_context, self.r_context)))
        return jax.lax.conv_general_dilated(
            pad, self.ctx_w, window_strides=(1,), padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.project_dim,
        )

    def _out(self, proj, train):
        out = jnp.einsum("npt,op->not", proj, self.out_proj_w[:, :, 0]) + self.out_proj_b[None, :, None]
        out = apply_norm(self.out_norm, out, train=train)
        out = jax.nn.relu(out)
        out = self.drop(out, deterministic=not train)
        return out

    def __call__(self, x, memory=None, train: bool = False):
        proj = self._project_in(x)
        ctx = self._context(proj)
        proj = proj + ctx
        if memory is not None:
            proj = proj + memory
        return self._out(proj, train), proj

    # -------------------------------------------------------------- streaming
    @property
    def ctx_frames(self) -> int:
        return self.l_context

    def init_ctx(self, batch: int, dtype=jnp.float32):
        assert self.r_context == 0, "streaming requires a causal FSMN"
        assert self.dilation == 1, "streaming supports dilation 1"
        return jnp.zeros((batch, self.project_dim, self.l_context), dtype)

    def _context_stream(self, proj, ring):
        """Causal context conv fed by the carried l_context-frame ring."""
        full = jnp.concatenate([ring, proj], axis=-1)
        ctx = jax.lax.conv_general_dilated(
            full, self.ctx_w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.project_dim)
        return ctx, full[..., -self.l_context:]

    def step_chunk(self, x, memory, ring, embed=None):
        """Streaming chunk: (x [B,C,K], layer-chained memory, carried ring)
        -> (out [B,C,K], new memory, new ring). Memory chains across LAYERS
        within a forward (frame-local), so only the ring carries time."""
        proj = self._project_in(x)
        ctx, new_ring = self._context_stream(proj, ring)
        proj = proj + ctx
        if memory is not None:
            proj = proj + memory
        return self._out(proj, False), proj, new_ring


class ConditionFSMN(FSMN):
    """FSMN with speaker-embedding conditioning (concat-proj or FiLM).

    Parity: puresound/nnet/lobe/rnn.py:134-220.
    """

    embed_dim: int = 0
    use_film: bool = False

    def setup(self):
        super().setup()
        if not self.use_film:
            k = 1.0 / np.sqrt(self.project_dim + self.embed_dim)
            self.embed_proj_w = self.param(
                "embed_proj_w", _uniform_init(k),
                (self.project_dim, self.project_dim + self.embed_dim, 1))
        else:
            k = 1.0 / np.sqrt(self.embed_dim)
            self.cond_scale_w = self.param("cond_scale_w", _uniform_init(k),
                                           (self.project_dim, self.embed_dim, 1))
            self.cond_bias_w = self.param("cond_bias_w", _uniform_init(k),
                                          (self.project_dim, self.embed_dim, 1))

    def __call__(self, x, embed, memory=None, train: bool = False):
        proj = self._project_in(x)
        ctx = self._context(proj)
        if not self.use_film:
            T = x.shape[-1]
            e = jnp.broadcast_to(embed[:, :, None], (embed.shape[0], embed.shape[1], T))
            condi = jnp.concatenate([ctx, e], axis=1)
            condi = jnp.einsum("nct,pc->npt", condi, self.embed_proj_w[:, :, 0])
            proj = proj + ctx + condi
        else:
            scale = jnp.einsum("ne,pe->np", embed, self.cond_scale_w[:, :, 0])[:, :, None]
            bias = jnp.einsum("ne,pe->np", embed, self.cond_bias_w[:, :, 0])[:, :, None]
            proj = scale * proj + bias
            ctx = scale * ctx + bias
            proj = proj + ctx
        if memory is not None:
            proj = proj + memory
        return self._out(proj, train), proj

    def step_chunk(self, x, memory, ring, embed=None):
        """Streaming chunk with conditioning; same contract as FSMN."""
        proj = self._project_in(x)
        ctx, new_ring = self._context_stream(proj, ring)
        if not self.use_film:
            K = x.shape[-1]
            e = jnp.broadcast_to(embed[:, :, None],
                                 (embed.shape[0], embed.shape[1], K))
            condi = jnp.concatenate([ctx, e], axis=1)
            condi = jnp.einsum("nct,pc->npt", condi, self.embed_proj_w[:, :, 0])
            proj = proj + ctx + condi
        else:
            scale = jnp.einsum("ne,pe->np", embed,
                               self.cond_scale_w[:, :, 0])[:, :, None]
            bias = jnp.einsum("ne,pe->np", embed,
                              self.cond_bias_w[:, :, 0])[:, :, None]
            proj = scale * proj + bias
            ctx = scale * ctx + bias
            proj = proj + ctx
        if memory is not None:
            proj = proj + memory
        return self._out(proj, False), proj, new_ring
