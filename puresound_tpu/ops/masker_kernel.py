"""Pallas TPU kernels fusing the DPCRN masker's streaming chunk.

Round-3 NS streaming breakdown at B=4096 (bf16, dp_kernel): dual-path
kernel 10.5 ms, but the XLA down/up conv chains + skip/channel concats +
the [B,CH,F,K]<->[F,K,B,CH] packing transposes around the kernel cost
another ~9 ms — almost entirely HBM copies (the conv FLOPs are <1 ms).

Shipped here: `center_chunk` (DPCRN) and `dparn_center_chunk` (DPARN),
fusing the three CENTER stages — the last down conv (d4), the whole
bottleneck (dual-path LSTM blocks shared with ops/dual_path_kernel.py,
or DPARN's attention intra + inter LSTM shared with
ops/dparn_attention_kernel.py), and the first up transpose conv (u0) —
per stream tile with everything VMEM-resident. These move the step's largest
tensors (bottleneck in/out and the u0 skip are [B, 128, 64, K] each) and
the u0 channel concat; the packing transposes around the old dp_kernel
disappear too. The outer layers (d0-d3 / u1-u4, C <= 64) stay in XLA.

Conv formulation inside the kernel: rows are [carried previous frame |
K chunk frames] per frequency, so a causal time-kernel-2 conv is SIX
shared-weight matmuls (3 freq taps x 2 time-row slices, freq-chunked
with +-1 halos); BatchNorm eval affines are folded into the weights
host-side; the u0 transpose conv flips the time taps and inverts the
freq relation, split into an h-part and a skip-part so the stock path's
channel concat never materializes.

Also here (groundwork for fusing the OUTER layers, where 128//C > 1
freq-packing makes conv taps cross lane groups): a validated
block-banded weight builder — `build_layer_blocks` turns any of the
down/up conv layers into static (out_blk, in_blk, dt) -> [128, 128]
matmul lists over the packed layout lane(f, c) = c*P + f%P, P = 128//C
(tested against Conv2d/ConvTranspose2d on every DPCRN geometry in
tests/test_pallas_kernels.py).

Parity anchor: the stock streaming path Unet._stream_down/_stream_up
(nnet/unet.py) + DPRNNblock2D.step_chunk (nnet/dpcrn.py); reference
topology puresound/nnet/dpcrn.py:84-213.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dparn_attention_kernel import ATTN_LAYER_NAMES, attention_encoder_layer
from .dual_path_kernel import (_PER_BLOCK, _ln, _lstm_gates, dual_path_body,
                               make_dots)


# ---------------------------------------------------------------------------
# host-side weight building
# ---------------------------------------------------------------------------

def pack_geometry(F: int, C: int) -> Tuple[int, int]:
    """(freqs per block P, number of 128-lane blocks) for a [C, F] plane."""
    assert 128 % C == 0 and C <= 128, f"channel count {C} must divide 128"
    P = 128 // C
    n_blk = (F + P - 1) // P
    assert F % P == 0, f"freq count {F} must fill whole blocks (P={P})"
    return P, n_blk


def lane_of(f: int, c: int, P: int) -> Tuple[int, int]:
    """(block, lane) of freq f channel c under the packed layout."""
    return f // P, (c * P) + (f % P)


def _dense_conv_matrix(w: np.ndarray, kind: str, stride: int, pad: int,
                       out_pad: int, F_in: int, F_out: int) -> List[np.ndarray]:
    """Dense [C_in*F_in-packed, C_out*F_out-packed] frequency matmul matrix
    per time tap, for a freq-axis conv ('conv': w [co, ci, kf, kt]) or
    transpose conv ('tconv': w [ci, co, kf, kt], torch semantics).

    Returns [kt] matrices D with D[dt][in_flat, out_flat] so that
    out[:, fo, co] (frame k) = sum_dt in_frame(k-1+dt) @ D[dt].
    """
    if kind == "conv":
        co_n, ci_n, kf, kt = w.shape
        get = lambda co, ci, df, dt: w[co, ci, df, dt]
    else:
        ci_n, co_n, kf, kt = w.shape
        get = lambda co, ci, df, dt: w[ci, co, df, dt]
    P_in, nbi = pack_geometry(F_in, ci_n)
    P_out, nbo = pack_geometry(F_out, co_n)
    mats = [np.zeros((nbi * 128, nbo * 128), np.float32) for _ in range(kt)]
    for fo in range(F_out):
        for df in range(kf):
            if kind == "conv":
                fi = fo * stride - pad + df
            else:
                # torch ConvTranspose: out[fo] += in[fi] * w[.., df] where
                # fo = fi*stride - pad + df
                num = fo + pad - df
                if num % stride:
                    continue
                fi = num // stride
            if not (0 <= fi < F_in):
                continue
            for dt in range(kt):
                # row-slot semantics: mats[s] multiplies input frame
                # k-1+s of output frame k. Causal conv (left-pad kt-1):
                # slot s holds w tap s. Transpose conv: input frame t
                # contributes to output t+dt, so out k reads frame k-dt
                # -> slot 1-dt (time taps flipped).
                slot = dt if kind == "conv" else kt - 1 - dt
                for co in range(co_n):
                    ob, ol = lane_of(fo, co, P_out)
                    for ci in range(ci_n):
                        ib, il = lane_of(fi, ci, P_in)
                        mats[slot][ib * 128 + il, ob * 128 + ol] = \
                            get(co, ci, df, dt)
    return mats


def build_layer_blocks(w: np.ndarray, bias: np.ndarray, kind: str,
                       stride: int, pad: int, out_pad: int,
                       F_in: int, F_out: int,
                       bn_scale=None, bn_bias=None, bn_mean=None,
                       bn_var=None, bn_eps: float = 1e-5):
    """Block-banded weights for one freq-conv layer.

    Returns (triples, W_stack [n, 128, 128], bias_vec [128]) where
    `triples` is a static list of (out_blk, in_blk, dt, idx) and bias_vec
    is the per-lane output bias (BatchNorm eval affine folded in when the
    bn_* running stats are given).
    """
    C_out = w.shape[0] if kind == "conv" else w.shape[1]
    w = np.asarray(w, np.float32)
    bias = np.asarray(bias, np.float32)
    if bn_scale is not None:
        g = np.asarray(bn_scale, np.float32)
        b = np.asarray(bn_bias, np.float32)
        mu = np.asarray(bn_mean, np.float32)
        rstd = 1.0 / np.sqrt(np.asarray(bn_var, np.float32) + bn_eps)
        if kind == "conv":
            w = w * (g * rstd)[:, None, None, None]
        else:
            w = w * (g * rstd)[None, :, None, None]
        bias = (bias - mu) * g * rstd + b
    mats = _dense_conv_matrix(w, kind, stride, pad, out_pad, F_in, F_out)
    P_out, nbo = pack_geometry(F_out, C_out)
    triples, blocks = [], []
    for dt, D in enumerate(mats):
        nbi = D.shape[0] // 128
        for ob in range(nbo):
            for ib in range(nbi):
                blk = D[ib * 128:(ib + 1) * 128, ob * 128:(ob + 1) * 128]
                if np.any(blk):
                    triples.append((ob, ib, dt, len(blocks)))
                    blocks.append(blk)
    W = np.stack(blocks, axis=0) if blocks else np.zeros((1, 128, 128),
                                                         np.float32)
    bias_vec = np.zeros((128,), np.float32)
    for c in range(C_out):
        for p in range(P_out):
            bias_vec[c * P_out + p] = bias[c]
    return triples, W, bias_vec


def pack_channel_perm(F: int, C: int) -> np.ndarray:
    """Permutation taking a channel-major flat [C*F] vector (channel c,
    freq f at c*F + f — the engine's RI layout) to packed lane order
    (blk*128 + lane)."""
    P, n_blk = pack_geometry(F, C)
    perm = np.zeros(n_blk * 128, np.int64)
    for f in range(F):
        for c in range(C):
            blk, lane = lane_of(f, c, P)
            perm[blk * 128 + lane] = c * F + f
    return perm


# ---------------------------------------------------------------------------
# wide-center fusion: d_{n-3}..d_{n-1} convs -> bottleneck -> u0..u2 convs
# ---------------------------------------------------------------------------
#
# Every masker layer the streaming step runs at the bottleneck frequency
# count is stride-1 with freq kernel 3 — so the whole inner stack (three
# down convs, the bottleneck, three up transpose convs with their skip
# connections) fuses into ONE Pallas call with plain shared-weight
# matmuls: no freq packing, no banded blocks (those remain groundwork for
# the stride-2 edge layers d0/d1/u3/u4, which stay in XLA and move <15%
# of the stock path's HBM bytes).
#
# Conv formulation: per layer a scratch buffer [F, bt + K*bt, C] holds
# [carried prev frame | K chunk frames] rows; a causal time-kernel-2
# freq-conv is SIX shared-weight matmuls (3 freq taps x 2 time-row
# slices, +-1 freq halos) accumulated in f32 with the BatchNorm eval
# affine folded into the weights; transpose convs flip the time taps and
# invert the freq relation (see _dense_conv_matrix notes) and split into
# an h-part and a skip-part read straight from the down buffers — the
# stock path's channel concats never materialize. Up skip carries alias
# the down in-carries (layer i+1's input carry IS layer i's output last
# frame), so only the h-side up carries are extra state.

def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def load_rows(scr, carry_ref, frames, bt):
    """Fill a [F, bt + K*bt, C] stage buffer: carry rows then frames."""
    scr[:, :bt, :] = carry_ref[:].astype(scr.dtype)
    if frames is not None:
        scr[:, bt:, :] = frames.astype(scr.dtype)


def conv_stage(dot, h_scr, s_scr, Wh, Ws, b_ref, a_ref, write,
               F, K, bt, fc, kind):
    """One fused k_f-3 / stride-1 conv layer over stage buffers.

    h_scr (and optional skip source s_scr): [F, bt + K*bt, C_in] with the
    carried previous frame in rows [0:bt]. kind 'conv': out fo reads in
    freqs fo-1+df (causal down conv); 'tconv': fo+1-df (transpose up
    conv, time taps pre-flipped in the weights). write(f0, acc) stores
    each freq chunk's [fc*K*bt, C_out] activation."""
    R = K * bt
    # Mosaic supports only 32-bit scalar vector.extracts — a_ref is bf16
    # under half-precision serving, so cast the vector BEFORE extracting
    # (a bare a_ref[0] fails the real-TPU compile; interpret mode passes)
    alpha = a_ref[:].astype(jnp.float32)[0]
    for f0 in range(0, F, fc):
        lo, hi = max(f0 - 1, 0), min(f0 + fc + 1, F)

        def halo(scr):
            v = scr[lo:hi].astype(jnp.float32)
            return jnp.pad(v, ((1 - (f0 - lo), (f0 + fc + 1) - hi),
                               (0, 0), (0, 0)))

        hv = halo(h_scr)
        sv = halo(s_scr) if s_scr is not None else None
        acc = jnp.zeros((fc * R, b_ref.shape[0]), jnp.float32) + b_ref[:]
        for t in range(2):  # time-row slot (kernel_t == 2)
            rows = slice(t * bt, t * bt + R)
            for df in range(3):
                fs = (slice(df, df + fc) if kind == "conv"
                      else slice(2 - df, 2 - df + fc))
                acc += dot(hv[fs, rows, :].reshape(fc * R, -1),
                           Wh[t * 3 + df])
                if sv is not None:
                    acc += dot(sv[fs, rows, :].reshape(fc * R, -1),
                               Ws[t * 3 + df])
        write(f0, _prelu(acc, alpha))


def inter_lstm_block(dot, x_scr, h_in, c_in, h_out, c_out, w,
                     K, F, bt, H, row0=0):
    """Inter (time) LSTM + projection + LayerNormLast + residual, in
    place on x_scr rows [row0:] — the dual_path_body inter section for
    bottlenecks whose intra pass is not an LSTM (DPARN attention)."""
    CH = x_scr.shape[-1]
    n_ichunk = 4 if (bt >= 256 and F % 4 == 0) else (
        2 if F % 2 == 0 else 1)
    ic = F // n_ichunk
    for p0 in range(0, F, ic):
        h = h_in[p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
        c = c_in[p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
        for k in range(K):
            lo, hi = row0 + k * bt, row0 + (k + 1) * bt
            rows = x_scr[p0:p0 + ic, lo:hi, :].reshape(ic * bt, CH)
            gates = (dot(rows, w["w_ih_i"]) + dot(h, w["w_hh_i"])
                     + w["b_i"][:])
            h, c = _lstm_gates(gates, c, H)
            t = dot(h, w["pw_i"]) + w["pb_i"][:]
            t = _ln(t, w["tg"][:], w["tb"][:])
            x_scr[p0:p0 + ic, lo:hi, :] = (
                x_scr[p0:p0 + ic, lo:hi, :]
                + t.reshape(ic, bt, CH)).astype(x_scr.dtype)
        h_out[p0:p0 + ic] = h.reshape(ic, bt, H).astype(h_out.dtype)
        c_out[p0:p0 + ic] = c.reshape(ic, bt, H).astype(c_out.dtype)


N_CONV = 6            # (2 time slots) x (3 freq taps)
N_DOWN = N_UP = 3     # fused inner layers each side of the bottleneck
# per-layer conv weight refs: down = 6 W + bias + alpha; up = 6 Wh +
# 6 Ws + bias + alpha
_N_CONV_REFS = N_DOWN * (N_CONV + 2) + N_UP * (2 * N_CONV + 2)

# DPARN per-block weight order (35 arrays): 2 encoder layers x
# ATTN_LAYER_NAMES (12 each), then fc_k, fc_b, nrm_g, nrm_b, then inter
# w_ih_i [CH,4H], w_hh_i [H,4H], b_i [4H], pw_i [H,CH], pb_i [CH],
# tg [CH], tb [CH]
_DPARN_PER_BLOCK = 2 * len(ATTN_LAYER_NAMES) + 4 + 7


def _parse_conv_weights(nxt):
    """Pull the per-layer conv weight refs (prep order of
    DualPathStreaming._mk_conv_weights)."""
    down, up = [], []
    for _ in range(N_DOWN):
        Wd = [nxt() for _ in range(N_CONV)]
        down.append((Wd, nxt(), nxt()))            # (W, bias, alpha)
    for _ in range(N_UP):
        Wh = [nxt() for _ in range(N_CONV)]
        Ws = [nxt() for _ in range(N_CONV)]
        up.append((Wh, Ws, nxt(), nxt()))          # (Wh, Ws, bias, alpha)
    return down, up


def _make_wide_kernel(bottleneck, n_bneck_refs, K, F, bt, chans, dot_dtype):
    """Shared conv envelope: 3 down stages -> `bottleneck(x_scr, w_refs,
    h_in, c_in, h_out, c_out, row0)` -> 3 up stages. chans = (C_in0, C2,
    C3, C4, CH, Cu2) channel counts of the fused stack."""
    fc = min(16, F)
    assert F % fc == 0, f"bottleneck freq count {F} must chunk by {fc}"
    dot, _ = make_dots(dot_dtype, False)
    C_in0 = chans[0]
    R = K * bt

    def kernel(x_ref, *refs):
        it = iter(range(len(refs)))
        nxt = lambda: refs[next(it)]
        extra_in = nxt()  # pe for DPARN; unused dummy for DPCRN
        dc = [nxt() for _ in range(3)]
        u0h_ref, u0s_ref, u1h_ref, u2h_ref = nxt(), nxt(), nxt(), nxt()
        h_in = [nxt(), nxt()]
        c_in = [nxt(), nxt()]
        down_w, up_w = _parse_conv_weights(nxt)
        w_refs = [nxt() for _ in range(n_bneck_refs)]
        y_ref = nxt()
        dc_out = [nxt() for _ in range(3)]
        u0h_out, u0s_out, u1h_out, u2h_out = nxt(), nxt(), nxt(), nxt()
        h_out = [nxt(), nxt()]
        c_out = [nxt(), nxt()]
        (B_in, B_d2, B_d3, x_scr, skip_scr, B_u0, B_u1) = (
            nxt(), nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
        scratch_rest = [refs[i] for i in it]  # yf/yb for the dual path

        def to_scr(dst):
            def write(f0, acc):
                dst[f0:f0 + fc, bt:, :] = acc.reshape(
                    fc, R, dst.shape[-1]).astype(dst.dtype)
            return write

        def to_both(a, b):
            def write(f0, acc):
                v = acc.reshape(fc, R, a.shape[-1])
                a[f0:f0 + fc, bt:, :] = v.astype(a.dtype)
                b[f0:f0 + fc, bt:, :] = v.astype(b.dtype)
            return write

        def to_y(f0, acc):
            y_ref[f0:f0 + fc] = acc.reshape(
                fc, K, bt, y_ref.shape[-1]).astype(y_ref.dtype)

        # ---------------- down stages ----------------
        load_rows(B_in, dc[0], x_ref[:].reshape(F, R, C_in0), bt)
        B_d2[:, :bt, :] = dc[1][:].astype(B_d2.dtype)
        conv_stage(dot, B_in, None, *down_w[0][:1], None, down_w[0][1],
                   down_w[0][2], to_scr(B_d2), F, K, bt, fc, "conv")
        B_d3[:, :bt, :] = dc[2][:].astype(B_d3.dtype)
        conv_stage(dot, B_d2, None, down_w[1][0], None, down_w[1][1],
                   down_w[1][2], to_scr(B_d3), F, K, bt, fc, "conv")
        x_scr[:, :bt, :] = u0h_ref[:].astype(x_scr.dtype)
        skip_scr[:, :bt, :] = u0s_ref[:].astype(skip_scr.dtype)
        conv_stage(dot, B_d3, None, down_w[2][0], None, down_w[2][1],
                   down_w[2][2], to_both(x_scr, skip_scr), F, K, bt, fc,
                   "conv")
        dc_out[0][:] = B_in[:, R:, :].astype(dc_out[0].dtype)
        dc_out[1][:] = B_d2[:, R:, :].astype(dc_out[1].dtype)
        dc_out[2][:] = B_d3[:, R:, :].astype(dc_out[2].dtype)
        u0s_out[:] = skip_scr[:, R:, :].astype(u0s_out.dtype)

        # ---------------- bottleneck (in place, rows [bt:]) ----------------
        bottleneck(x_scr, extra_in, w_refs, h_in, c_in, h_out, c_out,
                   scratch_rest, bt)
        u0h_out[:] = x_scr[:, R:, :].astype(u0h_out.dtype)

        # ---------------- up stages ----------------
        B_u0[:, :bt, :] = u1h_ref[:].astype(B_u0.dtype)
        conv_stage(dot, x_scr, skip_scr, up_w[0][0], up_w[0][1],
                   up_w[0][2], up_w[0][3], to_scr(B_u0), F, K, bt, fc,
                   "tconv")
        u1h_out[:] = B_u0[:, R:, :].astype(u1h_out.dtype)
        B_u1[:, :bt, :] = u2h_ref[:].astype(B_u1.dtype)
        conv_stage(dot, B_u0, B_d3, up_w[1][0], up_w[1][1],
                   up_w[1][2], up_w[1][3], to_scr(B_u1), F, K, bt, fc,
                   "tconv")
        u2h_out[:] = B_u1[:, R:, :].astype(u2h_out.dtype)
        conv_stage(dot, B_u1, B_d2, up_w[2][0], up_w[2][1],
                   up_w[2][2], up_w[2][3], to_y, F, K, bt, fc, "tconv")

    return kernel


def pick_center_tile(B, F, K, chans, H, bf16: bool, xscr_half: bool,
                     n_extra_scr: int = 0) -> int:
    """Largest stream tile whose estimated VMEM footprint fits the chip.

    The estimate is 4.2x the declared scratch bytes, calibrated on the
    flagship DPCRN geometry where the hardware compiler allocated 185.6 MB
    at b_tile=128 against ~38 MB of declared scratch (in-kernel
    temporaries and double-buffered blocks dominate); budget 120 MB of the
    v5e's 128 MB VMEM. Static tile tables OOM'd the real TPU at geometries
    interpret mode happily accepted.
    """
    scr = 2 if bf16 else 4
    xscr = 2 if xscr_half else 4
    C_in0, C2, C3, C4, CH, Cu2 = chans

    def est(bt):
        rows = bt + K * bt
        stage = F * rows * ((C_in0 + C2 + C3 + C4 + Cu2 + CH) * scr
                            + CH * xscr)
        extra = n_extra_scr * F * K * bt * H * scr
        return 4.2 * (stage + extra)

    for bt in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % bt == 0 and est(bt) <= 120e6:
            return bt
    return 1


def _wide_call(x, extra_in, dc, u0h, u0s, u1h, u2h, h_in, c_in,
               conv_weights, bneck_weights, bottleneck, extra_scratch,
               b_tile, interpret, dot_dtype, xscr_half, y_C):
    """pallas_call plumbing shared by center_chunk / dparn_center_chunk."""
    F, K, B, C_in0 = x.shape
    H = h_in[0].shape[-1]
    CH = u0h.shape[-1]
    chans = (C_in0, dc[1].shape[-1], dc[2].shape[-1], u1h.shape[-1], CH,
             u2h.shape[-1])
    assert B % b_tile == 0, f"stream batch {B} must tile by {b_tile}"
    R = K * b_tile

    kernel = _make_wide_kernel(bottleneck, len(bneck_weights), K, F,
                               b_tile, chans, dot_dtype)

    grid = (B // b_tile,)
    spec_x = pl.BlockSpec((F, K, b_tile, C_in0), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_y = pl.BlockSpec((F, K, b_tile, y_C), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    carry = lambda a: pl.BlockSpec((F, b_tile, a.shape[-1]),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM)

    carries = list(dc) + [u0h, u0s, u1h, u2h] + list(h_in) + list(c_in)
    in_specs = ([spec_x, full(extra_in)] + [carry(a) for a in carries]
                + [full(w) for w in conv_weights]
                + [full(w) for w in bneck_weights])

    out_shape = ([jax.ShapeDtypeStruct((F, K, B, y_C), x.dtype)]
                 + [jax.ShapeDtypeStruct((F, B, a.shape[-1]), a.dtype)
                    for a in carries])
    out_specs = tuple([spec_y] + [carry(a) for a in carries])

    scr_dt = jnp.bfloat16 if dot_dtype == jnp.bfloat16 else jnp.float32
    x_scr_dt = jnp.bfloat16 if xscr_half else jnp.float32
    rows = b_tile + R
    C_in0_, C2, C3, C4, CH_, Cu2 = chans
    scratch_shapes = [
        pltpu.VMEM((F, rows, C_in0_), scr_dt),   # B_in
        pltpu.VMEM((F, rows, C2), scr_dt),       # B_d2 (d2 out)
        pltpu.VMEM((F, rows, C3), scr_dt),       # B_d3 (d3 out)
        pltpu.VMEM((F, rows, CH_), x_scr_dt),    # x_scr (bottleneck)
        pltpu.VMEM((F, rows, CH_), scr_dt),      # skip_scr
        pltpu.VMEM((F, rows, C4), scr_dt),       # B_u0 (u0 out)
        pltpu.VMEM((F, rows, Cu2), scr_dt),      # B_u1 (u1 out)
    ] + extra_scratch

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, extra_in, *carries, *conv_weights, *bneck_weights)
    y = outs[0]
    dc_n = list(outs[1:4])
    u0h_n, u0s_n, u1h_n, u2h_n = outs[4:8]
    h_out = list(outs[8:10])
    c_out = list(outs[10:12])
    return y, dc_n, u0h_n, u0s_n, u1h_n, u2h_n, h_out, c_out


@functools.partial(jax.jit, static_argnames=(
    "b_tile", "interpret", "dot_dtype", "int8_hh", "xscr_half"))
def center_chunk(x, dc, u0h, u0s, u1h, u2h, h_in, c_in, conv_weights,
                 dp_weights, b_tile: int = 128, interpret: bool = False,
                 dot_dtype=jnp.float32, int8_hh: bool = False,
                 xscr_half: bool = False):
    """DPCRN wide-center fusion: d_{n-3}..d_{n-1} convs -> both dual-path
    blocks -> u0..u2 transpose convs, one kernel.

    Args:
        x: [F, K, B, C_in0] — the d_{n-4} output (freq-major packing).
        dc: 3 down in-carries [F, B, C_i] (layer i's previous last input
            frame; they double as the up skip carries).
        u0h/u1h/u2h: carried previous h-inputs of the fused up layers
            ([F, B, C]); u0s: carried previous d_{n-1}-out (skip) frame.
        h_in/c_in: per-block [F, B, H] inter-LSTM carries.
        conv_weights: flat list from DualPathStreaming._mk_conv_weights
            (BatchNorm eval affines pre-folded, transpose-conv time taps
            pre-flipped).
        dp_weights: flat dual-path tuple (dual_path_kernel module doc).

    Returns: (y [F, K, B, C_out], dc', u0h', u0s', u1h', u2h', h', c').
    """
    F, K, B, _ = x.shape
    H = h_in[0].shape[-1]
    dot, dot_hh = make_dots(dot_dtype, int8_hh)

    def bottleneck(x_scr, extra_in, w_refs, h_in_r, c_in_r, h_out_r,
                   c_out_r, scratch_rest, bt):
        yf_scr, yb_scr = scratch_rest
        dual_path_body(dot, dot_hh, x_scr, yf_scr, yb_scr, w_refs,
                       h_in_r, c_in_r, h_out_r, c_out_r,
                       2, K, F, H, bt, int8_hh, row0=bt)

    scr_dt = jnp.bfloat16 if dot_dtype == jnp.bfloat16 else jnp.float32
    extra_scratch = [pltpu.VMEM((F, K * b_tile, H), scr_dt),
                     pltpu.VMEM((F, K * b_tile, H), scr_dt)]
    dummy = jnp.zeros((1, 1), jnp.float32)  # no extra input for DPCRN
    n_pb = _PER_BLOCK + (3 if int8_hh else 0)
    assert len(dp_weights) == 2 * n_pb
    y_C = conv_weights[-2].shape[0]  # last up layer's bias length
    return _wide_call(x, dummy, dc, u0h, u0s, u1h, u2h, h_in, c_in,
                      tuple(conv_weights), tuple(dp_weights), bottleneck,
                      extra_scratch, b_tile, interpret, dot_dtype,
                      xscr_half, y_C)


@functools.partial(jax.jit, static_argnames=(
    "heads", "b_tile", "interpret", "dot_dtype", "xscr_half"))
def dparn_center_chunk(x, pe, dc, u0h, u0s, u1h, u2h, h_in, c_in,
                       conv_weights, block_weights, heads: int,
                       b_tile: int = 128, interpret: bool = False,
                       dot_dtype=jnp.float32, xscr_half: bool = False):
    """DPARN wide-center fusion: same envelope as center_chunk, with the
    bottleneck = 2x (attention intra over frequency tokens + inter
    uni-LSTM); `pe` [F, CH] feeds the first encoder layer only and
    `block_weights` is flat (_DPARN_PER_BLOCK per block)."""
    F, K, B, _ = x.shape
    H = h_in[0].shape[-1]
    dot, _ = make_dots(dot_dtype, False)
    cast = lambda a: a.astype(dot_dtype)

    def bottleneck(x_scr, pe_ref, w_refs, h_in_r, c_in_r, h_out_r,
                   c_out_r, scratch_rest, bt):
        R = K * bt
        CH = x_scr.shape[-1]
        pe_v = pe_ref[:].astype(jnp.float32)
        for b in range(2):
            w = {}
            names = ([f"l1_{n}" for n in ATTN_LAYER_NAMES]
                     + [f"l2_{n}" for n in ATTN_LAYER_NAMES]
                     + ["fc_k", "fc_b", "nrm_g", "nrm_b",
                        "w_ih_i", "w_hh_i", "b_i", "pw_i", "pb_i",
                        "tg", "tb"])
            for j, name in enumerate(names):
                w[name] = w_refs[b * _DPARN_PER_BLOCK + j]
            l1 = {n: w[f"l1_{n}"] for n in ATTN_LAYER_NAMES}
            l2 = {n: w[f"l2_{n}"] for n in ATTN_LAYER_NAMES}

            # intra attention over freq tokens, chunked over rows (rows
            # are independent; chunking bounds the Mosaic stack)
            rc = min(128, R)
            assert R % rc == 0
            for r0 in range(bt, bt + R, rc):
                v = x_scr[:, r0:r0 + rc, :].astype(jnp.float32)
                rows = jnp.swapaxes(v, 0, 1)  # [rc, F, CH]
                h = attention_encoder_layer(rows, pe_v, l1, heads, dot,
                                            cast)
                h = attention_encoder_layer(h, None, l2, heads, dot, cast)
                t = dot(h.reshape(rc * F, CH), w["fc_k"]) + w["fc_b"][:]
                t = _ln(t, w["nrm_g"][:], w["nrm_b"][:])
                rows = rows + t.reshape(rc, F, CH)
                x_scr[:, r0:r0 + rc, :] = jnp.swapaxes(rows, 0, 1).astype(
                    x_scr.dtype)

            inter_lstm_block(dot, x_scr, h_in_r[b], c_in_r[b],
                             h_out_r[b], c_out_r[b], w, K, F, bt, H,
                             row0=bt)

    assert len(block_weights) == 2 * _DPARN_PER_BLOCK
    y_C = conv_weights[-2].shape[0]
    return _wide_call(x, pe, dc, u0h, u0s, u1h, u2h, h_in, c_in,
                      tuple(conv_weights), tuple(block_weights),
                      bottleneck, [], b_tile, interpret, dot_dtype,
                      xscr_half, y_C)
