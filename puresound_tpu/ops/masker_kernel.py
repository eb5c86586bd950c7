"""Pallas TPU kernel: the ENTIRE DPCRN masker streaming chunk fused.

Round-3 NS streaming breakdown at B=4096 (bf16, dp_kernel): dual-path
kernel 10.5 ms, but the XLA down/up conv chains + skip/channel concats +
the [B,CH,F,K]<->[F,K,B,CH] packing transposes around the kernel cost
another ~9 ms — almost entirely HBM copies (the conv FLOPs are <1 ms).

This kernel runs the WHOLE masker per stream tile with every intermediate
VMEM-resident: freq-packed down convs -> dual-path bottleneck (both
blocks, same math as ops/dual_path_kernel.py) -> up transpose convs with
skip connections read straight from the down scratch buffers. HBM traffic
collapses to: packed RI in, packed mask out, conv time-carries, inter-LSTM
carries, and one weight read.

Freq-packed activation layout
-----------------------------
Per layer, activations live in scratch as [n_blk, (K+1)*bt, 128]:
- lanes pack P = 128//C consecutive freqs: lane(f, c) = c*P + f%P,
  blk(f) = f//P  (for the bottleneck C=128 this degrades to lanes ==
  channels and blk == f — exactly the dual-path kernel's layout);
- rows are time slots: rows [0:bt] hold the carried previous-chunk frame
  (the conv time context), rows [(k+1)*bt] hold this chunk's frame k.

A causal time-kernel-2 conv then becomes, per time tap dt in {0, 1}, a
row-contiguous slice [dt*bt : dt*bt + K*bt]; the frequency taps (incl.
stride-2 and transpose stride-2 up layers) are folded into PRECOMPUTED
block-banded weight matrices: out_blk <- sum_{(ib, dt)} in[ib, rows(dt)]
@ W[ob, ib, dt] with W [128, 128] built host-side from the conv weights
(BatchNorm eval affine folded in; see build_layer_blocks). Out-of-range
freq taps fall in guard rows of the dense build and are dropped, which
reproduces the explicit zero-padding of the stock path.

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

from .dual_path_kernel import _PER_BLOCK, _ln, _lstm_gates


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
