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
# center-fused kernel: d4 conv -> dual-path bottleneck -> u0 transpose conv
# ---------------------------------------------------------------------------
#
# The three central masker layers move the largest tensors of the NS
# streaming step (bottleneck in/out and the u0 skip concat are [B, 128, 64,
# K] each — ~134 MB at B=4096 bf16) and the stock path also pays two full
# packing transposes around the dual-path kernel. Fusing them keeps all of
# it VMEM-resident; the outer layers (d0-d3, u1-u4, C <= 64) stay in XLA
# where their freq-packing would otherwise need banded weight matrices
# (see build_layer_blocks — groundwork validated for a future full fusion).
#
# Conv formulation: with rows = [carried prev frame | K chunk frames] per
# freq, a causal time-kernel-2 freq-conv is SIX shared-weight matmuls
# (3 freq taps x 2 time-row slices) accumulated in f32; the u0 transpose
# conv is the same with time taps flipped and the freq relation inverted
# (see _dense_conv_matrix notes), split into an h-part and a skip-part so
# the stock path's channel concat never materializes.

def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def conv_down_stage(dot, x_ref, carry_ref, Wd, bd_ref, alpha_ref,
                    x_scr, skip_scr, F, K, bt, Ci, CH, fc):
    """Last down conv (k_f 3, pad 1, stride 1) + folded BN + PReLU into
    x_scr AND skip_scr. Rows buffer per freq = [carry | K frames]; freq
    chunks read a +-1 halo straight from the input refs (chunk-local
    values keep the Mosaic stack small)."""
    R = K * bt
    alpha = alpha_ref[0]
    for f0 in range(0, F, fc):
        lo, hi = max(f0 - 1, 0), min(f0 + fc + 1, F)
        v = jnp.concatenate(
            [carry_ref[lo:hi].astype(jnp.float32),
             x_ref[lo:hi].reshape(hi - lo, R, Ci).astype(jnp.float32)],
            axis=1)
        pads = ((1 - (f0 - lo), (f0 + fc + 1) - hi), (0, 0), (0, 0))
        v = jnp.pad(v, pads)  # [fc+2, bt+R, Ci]
        acc = jnp.zeros((fc * R, CH), jnp.float32) + bd_ref[:]
        for s in range(2):  # time-row slot (kernel_t == 2)
            rows = slice(s * bt, s * bt + R)
            for df in range(3):
                lhs = v[df:df + fc, rows, :].reshape(fc * R, Ci)
                acc += dot(lhs, Wd[s * 3 + df])
        acc = _prelu(acc, alpha).reshape(fc, R, CH)
        x_scr[f0:f0 + fc] = acc.astype(x_scr.dtype)
        skip_scr[f0:f0 + fc] = acc.astype(skip_scr.dtype)


def conv_up_stage(dot, x_scr, skip_scr, u0h_ref, u0s_ref, Wh, Ws,
                  bu_ref, alpha_ref, y_ref, F, K, bt, CH, Co, fc):
    """First up transpose conv (k_f 3, s 1, p 1) + folded BN + PReLU:
    out[fo] reads h/skip freqs fo+1-df; rows as in conv_down_stage,
    chunked over freq with +-1 halos from the scratch + carry refs."""
    R = K * bt
    alpha = alpha_ref[0]
    for f0 in range(0, F, fc):
        lo, hi = max(f0 - 1, 0), min(f0 + fc + 1, F)

        def halo(scr, carry_ref):
            v = jnp.concatenate(
                [carry_ref[lo:hi].astype(jnp.float32),
                 scr[lo:hi].astype(jnp.float32)], axis=1)
            pads = ((1 - (f0 - lo), (f0 + fc + 1) - hi), (0, 0), (0, 0))
            return jnp.pad(v, pads)  # [fc+2, bt+R, CH]

        hv = halo(x_scr, u0h_ref)
        sv = halo(skip_scr, u0s_ref)
        acc = jnp.zeros((fc * R, Co), jnp.float32) + bu_ref[:]
        for s in range(2):
            rows = slice(s * bt, s * bt + R)
            for df in range(3):
                fs = slice(2 - df, 2 - df + fc)
                acc += dot(hv[fs, rows, :].reshape(fc * R, CH),
                           Wh[s * 3 + df])
                acc += dot(sv[fs, rows, :].reshape(fc * R, CH),
                           Ws[s * 3 + df])
        acc = _prelu(acc, alpha)
        y_ref[f0:f0 + fc] = acc.reshape(fc, K, bt, Co).astype(y_ref.dtype)


def inter_lstm_block(dot, x_scr, h_in, c_in, h_out, c_out, w,
                     K, F, bt, H):
    """Inter (time) LSTM + projection + LayerNormLast + residual, in
    place on x_scr [F, K*bt, CH] — the dual_path_body inter section for
    bottlenecks whose intra pass is not an LSTM (DPARN attention)."""
    CH = x_scr.shape[-1]
    n_ichunk = 4 if (bt >= 256 and F % 4 == 0) else (
        2 if F % 2 == 0 else 1)
    ic = F // n_ichunk
    for p0 in range(0, F, ic):
        h = h_in[p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
        c = c_in[p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
        for k in range(K):
            lo, hi = k * bt, (k + 1) * bt
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


def _make_center_kernel(n_blocks: int, K: int, F: int, H: int, Ci: int,
                        CH: int, Co: int, dot_dtype, int8_hh: bool):
    fc = min(16, F)  # freq-chunk bounding the Mosaic stack temporaries
    assert F % fc == 0, f"bottleneck freq count {F} must chunk by {fc}"
    dot, dot_hh = make_dots(dot_dtype, int8_hh)
    PB = _PER_BLOCK + (3 if int8_hh else 0)
    N_CONV = 6  # (2 time slots) x (3 freq taps)

    def kernel(x_ref, *refs):
        # refs layout:
        #   d4c, u0h, u0s,
        #   h_in[2], c_in[2],
        #   Wd[6], bd, alpha_d, Wh[6], Ws[6], bu, alpha_u,
        #   dp weights [PB * n_blocks],
        #   y, d4c_out, u0h_out, u0s_out, h_out[2], c_out[2],
        #   scratch: x_scr [F, K*bt, CH], skip_scr, yf_scr, yb_scr
        it = iter(range(len(refs)))
        nxt = lambda: refs[next(it)]
        d4c_ref, u0h_ref, u0s_ref = nxt(), nxt(), nxt()
        h_in = [nxt() for _ in range(n_blocks)]
        c_in = [nxt() for _ in range(n_blocks)]
        Wd = [nxt() for _ in range(N_CONV)]
        bd_ref, ad_ref = nxt(), nxt()
        Wh = [nxt() for _ in range(N_CONV)]
        Ws = [nxt() for _ in range(N_CONV)]
        bu_ref, au_ref = nxt(), nxt()
        w_refs = [nxt() for _ in range(PB * n_blocks)]
        y_ref = nxt()
        d4c_out, u0h_out, u0s_out = nxt(), nxt(), nxt()
        h_out = [nxt() for _ in range(n_blocks)]
        c_out = [nxt() for _ in range(n_blocks)]
        x_scr, skip_scr, yf_scr, yb_scr = (nxt(), nxt(), nxt(), nxt())

        bt = x_ref.shape[2]
        R = K * bt

        conv_down_stage(dot, x_ref, d4c_ref, Wd, bd_ref, ad_ref,
                        x_scr, skip_scr, F, K, bt, Ci, CH, fc)
        d4c_out[:] = x_ref[:, K - 1].astype(d4c_out.dtype)
        u0s_out[:] = skip_scr[:, (K - 1) * bt:, :].astype(u0s_out.dtype)

        # ---------------- dual-path bottleneck (both blocks, in place) ----
        dual_path_body(dot, dot_hh, x_scr, yf_scr, yb_scr, w_refs,
                       h_in, c_in, h_out, c_out,
                       n_blocks, K, F, H, bt, int8_hh)
        u0h_out[:] = x_scr[:, (K - 1) * bt:, :].astype(u0h_out.dtype)

        conv_up_stage(dot, x_scr, skip_scr, u0h_ref, u0s_ref, Wh, Ws,
                      bu_ref, au_ref, y_ref, F, K, bt, CH, Co, fc)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "b_tile", "interpret", "dot_dtype", "int8_hh", "xscr_half"))
def center_chunk(x, d4c, u0h, u0s, h_in, c_in, conv_weights, dp_weights,
                 b_tile: int = 128, interpret: bool = False,
                 dot_dtype=jnp.float32, int8_hh: bool = False,
                 xscr_half: bool = False):
    """d4 conv -> dual-path bottleneck -> u0 transpose conv, one kernel.

    Args:
        x: [F, K, B, Ci] d3 output (freq-major packing as dual_path_chunk).
        d4c: [F, B, Ci] carried previous d3-out frame (d4's conv context).
        u0h: [F, B, CH] carried previous bottleneck-out frame.
        u0s: [F, B, CH] carried previous d4-out (skip) frame.
        h_in/c_in: per-block [F, B, H] inter-LSTM carries.
        conv_weights: (Wd[6] of [Ci, CH], bd [CH], alpha_d [1],
                       Wh[6] of [CH, Co], Ws[6] of [CH, Co], bu [Co],
                       alpha_u [1]) — BatchNorm eval affine pre-folded.
        dp_weights: flat dual-path tuple (dual_path_kernel module doc).

    Returns: (y [F, K, B, Co], d4c', u0h', u0s', h_out, c_out).
    """
    F, K, B, Ci = x.shape
    n_blocks = len(h_in)
    H = h_in[0].shape[-1]
    CH = u0h.shape[-1]
    Wd6, bd, alpha_d, Wh6, Ws6, bu, alpha_u = conv_weights
    Co = bu.shape[0]
    assert B % b_tile == 0, f"stream batch {B} must tile by {b_tile}"
    n_tiles = B // b_tile

    kernel = _make_center_kernel(n_blocks, K, F, H, Ci, CH, Co, dot_dtype,
                                 int8_hh)

    grid = (n_tiles,)
    spec_x = pl.BlockSpec((F, K, b_tile, Ci), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_y = pl.BlockSpec((F, K, b_tile, Co), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    carry = lambda C: pl.BlockSpec((F, b_tile, C), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM)

    conv_flat = list(Wd6) + [bd, alpha_d] + list(Wh6) + list(Ws6) + [bu, alpha_u]
    in_specs = ([spec_x, carry(Ci), carry(CH), carry(CH)]
                + [carry(H)] * (2 * n_blocks)
                + [full(w) for w in conv_flat]
                + [full(w) for w in dp_weights])

    out_shape = ([jax.ShapeDtypeStruct((F, K, B, Co), x.dtype),
                  jax.ShapeDtypeStruct((F, B, Ci), d4c.dtype),
                  jax.ShapeDtypeStruct((F, B, CH), u0h.dtype),
                  jax.ShapeDtypeStruct((F, B, CH), u0s.dtype)]
                 + [jax.ShapeDtypeStruct((F, B, H), h_in[0].dtype)
                    for _ in range(2 * n_blocks)])
    out_specs = ([spec_y, carry(Ci), carry(CH), carry(CH)]
                 + [carry(H)] * (2 * n_blocks))

    scr_dt = jnp.bfloat16 if dot_dtype == jnp.bfloat16 else jnp.float32
    x_scr_dt = jnp.bfloat16 if xscr_half else jnp.float32
    scratch_shapes = [
        pltpu.VMEM((F, K * b_tile, CH), x_scr_dt),
        pltpu.VMEM((F, K * b_tile, CH), scr_dt),
        pltpu.VMEM((F, K * b_tile, H), scr_dt),
        pltpu.VMEM((F, K * b_tile, H), scr_dt),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, d4c, u0h, u0s, *h_in, *c_in, *conv_flat, *dp_weights)
    y, d4c_n, u0h_n, u0s_n = outs[:4]
    h_out = list(outs[4:4 + n_blocks])
    c_out = list(outs[4 + n_blocks:])
    return y, d4c_n, u0h_n, u0s_n, h_out, c_out


# ---------------------------------------------------------------------------
# DPARN center fusion: d4 conv -> (attention intra + inter LSTM) x2 -> u0
# ---------------------------------------------------------------------------
#
# Same shape as center_chunk but the bottleneck blocks are DPARN's: the
# intra pass is 2 transformer encoder layers + FC + LayerNormLast over the
# F frequency tokens of every (stream, frame) row (shared code with
# ops/dparn_attention_kernel.attention_encoder_layer — straight-line MXU
# work, no serial frequency scan), the inter pass a uni-LSTM over the K
# chunk frames. Fusing removes the per-block [B,CH,F,K]<->[N*K,F,CH] pack
# transposes around the standalone attention kernel, the inter-LSTM HBM
# round trips, the d4/u0 convs and the u0 skip concat.

# per-block weight order (35 arrays): 2 encoder layers x ATTN_LAYER_NAMES
# (12 each), then fc_k, fc_b, nrm_g, nrm_b, then inter
# w_ih_i [CH,4H], w_hh_i [H,4H], b_i [4H], pw_i [H,CH], pb_i [CH],
# tg [CH], tb [CH]
_DPARN_PER_BLOCK = 2 * len(ATTN_LAYER_NAMES) + 4 + 7


def _make_dparn_center_kernel(n_blocks: int, K: int, F: int, heads: int,
                              H: int, Ci: int, CH: int, Co: int, dot_dtype):
    fc = min(16, F)
    assert F % fc == 0, f"bottleneck freq count {F} must chunk by {fc}"
    dot, _ = make_dots(dot_dtype, False)
    cast = lambda a: a.astype(dot_dtype)
    N_CONV = 6
    PB = _DPARN_PER_BLOCK

    def kernel(x_ref, pe_ref, *refs):
        it = iter(range(len(refs)))
        nxt = lambda: refs[next(it)]
        d4c_ref, u0h_ref, u0s_ref = nxt(), nxt(), nxt()
        h_in = [nxt() for _ in range(n_blocks)]
        c_in = [nxt() for _ in range(n_blocks)]
        Wd = [nxt() for _ in range(N_CONV)]
        bd_ref, ad_ref = nxt(), nxt()
        Wh = [nxt() for _ in range(N_CONV)]
        Ws = [nxt() for _ in range(N_CONV)]
        bu_ref, au_ref = nxt(), nxt()
        w_refs = [nxt() for _ in range(PB * n_blocks)]
        y_ref = nxt()
        d4c_out, u0h_out, u0s_out = nxt(), nxt(), nxt()
        h_out = [nxt() for _ in range(n_blocks)]
        c_out = [nxt() for _ in range(n_blocks)]
        x_scr, skip_scr = nxt(), nxt()

        bt = x_ref.shape[2]
        R = K * bt

        conv_down_stage(dot, x_ref, d4c_ref, Wd, bd_ref, ad_ref,
                        x_scr, skip_scr, F, K, bt, Ci, CH, fc)
        d4c_out[:] = x_ref[:, K - 1].astype(d4c_out.dtype)
        u0s_out[:] = skip_scr[:, (K - 1) * bt:, :].astype(u0s_out.dtype)

        pe = pe_ref[:].astype(jnp.float32)
        for b in range(n_blocks):
            w = {}
            names = ([f"l1_{n}" for n in ATTN_LAYER_NAMES]
                     + [f"l2_{n}" for n in ATTN_LAYER_NAMES]
                     + ["fc_k", "fc_b", "nrm_g", "nrm_b",
                        "w_ih_i", "w_hh_i", "b_i", "pw_i", "pb_i",
                        "tg", "tb"])
            for j, name in enumerate(names):
                w[name] = w_refs[b * PB + j]
            l1 = {n: w[f"l1_{n}"] for n in ATTN_LAYER_NAMES}
            l2 = {n: w[f"l2_{n}"] for n in ATTN_LAYER_NAMES}

            # intra attention over freq tokens, chunked over rows (rows
            # are independent; chunking bounds the Mosaic stack)
            rc = min(128, R)
            assert R % rc == 0
            for r0 in range(0, R, rc):
                v = x_scr[:, r0:r0 + rc, :].astype(jnp.float32)
                rows = jnp.swapaxes(v, 0, 1)  # [rc, F, CH]
                h = attention_encoder_layer(rows, pe, l1, heads, dot, cast)
                h = attention_encoder_layer(h, None, l2, heads, dot, cast)
                t = dot(h.reshape(rc * F, CH), w["fc_k"]) + w["fc_b"][:]
                t = _ln(t, w["nrm_g"][:], w["nrm_b"][:])
                rows = rows + t.reshape(rc, F, CH)
                x_scr[:, r0:r0 + rc, :] = jnp.swapaxes(rows, 0, 1).astype(
                    x_scr.dtype)

            inter_lstm_block(dot, x_scr, h_in[b], c_in[b],
                             h_out[b], c_out[b], w, K, F, bt, H)

        u0h_out[:] = x_scr[:, (K - 1) * bt:, :].astype(u0h_out.dtype)
        conv_up_stage(dot, x_scr, skip_scr, u0h_ref, u0s_ref, Wh, Ws,
                      bu_ref, au_ref, y_ref, F, K, bt, CH, Co, fc)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "heads", "b_tile", "interpret", "dot_dtype", "xscr_half"))
def dparn_center_chunk(x, pe, d4c, u0h, u0s, h_in, c_in, conv_weights,
                       block_weights, heads: int, b_tile: int = 128,
                       interpret: bool = False, dot_dtype=jnp.float32,
                       xscr_half: bool = False):
    """d4 conv -> DPARN bottleneck (attention intra + inter LSTM, both
    blocks) -> u0 transpose conv, one kernel. Same contract as
    center_chunk plus `pe` ([F, CH] sinusoidal positions, first encoder
    layer only) and `block_weights` (flat, _DPARN_PER_BLOCK per block)."""
    F, K, B, Ci = x.shape
    n_blocks = len(h_in)
    H = h_in[0].shape[-1]
    CH = u0h.shape[-1]
    Wd6, bd, alpha_d, Wh6, Ws6, bu, alpha_u = conv_weights
    Co = bu.shape[0]
    assert B % b_tile == 0, f"stream batch {B} must tile by {b_tile}"
    n_tiles = B // b_tile

    kernel = _make_dparn_center_kernel(n_blocks, K, F, heads, H, Ci, CH, Co,
                                       dot_dtype)

    grid = (n_tiles,)
    spec_x = pl.BlockSpec((F, K, b_tile, Ci), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_y = pl.BlockSpec((F, K, b_tile, Co), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    carry = lambda C: pl.BlockSpec((F, b_tile, C), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM)

    conv_flat = list(Wd6) + [bd, alpha_d] + list(Wh6) + list(Ws6) + [bu, alpha_u]
    in_specs = ([spec_x, full(pe), carry(Ci), carry(CH), carry(CH)]
                + [carry(H)] * (2 * n_blocks)
                + [full(w) for w in conv_flat]
                + [full(w) for w in block_weights])

    out_shape = ([jax.ShapeDtypeStruct((F, K, B, Co), x.dtype),
                  jax.ShapeDtypeStruct((F, B, Ci), d4c.dtype),
                  jax.ShapeDtypeStruct((F, B, CH), u0h.dtype),
                  jax.ShapeDtypeStruct((F, B, CH), u0s.dtype)]
                 + [jax.ShapeDtypeStruct((F, B, H), h_in[0].dtype)
                    for _ in range(2 * n_blocks)])
    out_specs = ([spec_y, carry(Ci), carry(CH), carry(CH)]
                 + [carry(H)] * (2 * n_blocks))

    scr_dt = jnp.bfloat16 if dot_dtype == jnp.bfloat16 else jnp.float32
    x_scr_dt = jnp.bfloat16 if xscr_half else jnp.float32
    scratch_shapes = [
        pltpu.VMEM((F, K * b_tile, CH), x_scr_dt),
        pltpu.VMEM((F, K * b_tile, CH), scr_dt),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, pe, d4c, u0h, u0s, *h_in, *c_in, *conv_flat, *block_weights)
    y, d4c_n, u0h_n, u0s_n = outs[:4]
    h_out = list(outs[4:4 + n_blocks])
    c_out = list(outs[4 + n_blocks:])
    return y, d4c_n, u0h_n, u0s_n, h_out, c_out
