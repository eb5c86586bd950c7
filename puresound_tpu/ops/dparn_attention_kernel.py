"""Pallas TPU kernel: fused DPARN intra-frequency attention pass.

DPARN's streaming bottleneck is the intra pass: per chunk, every frame
runs 2 transformer encoder layers + FC + LayerNorm over F=64 frequency
tokens at C=128 dims with 8 heads of width 16. Stock XLA executes this as
~300 small fusions plus ~1.8 ms/step of layout copies (profiled at B=512:
8.35 ms device time, <2% MFU — no single op over 5%).

This kernel runs the whole intra pass for a tile of rows (row = one
(stream, frame)) in one program: both encoder layers (positional encoding,
QKV projections, batched per-head attention via Mosaic's batched
dot_general, out-projection, residual LayerNorms, ReLU feed-forward), the
final FC and LayerNormLast — all VMEM-resident, no HBM round trips between
the ~30 stock ops.

Semantics mirror MhaSelfAttenLayer (nnet/lobe/attention.py:103-158,
deterministic/serving mode) and DPARNblock2D's intra chain
(nnet/dparn.py); the accuracy gate vs the stock path lives in
tests/test_pallas_kernels.py.

CAPACITY FLOOR (round-4 conclusion): 1,408 streams @ <16 ms is the
measured DPARN serving floor on this toolchain. The kernel is MXU-rate
bound at the 1/8 lane utilization the per-head Dh=16 dots force:
- blockdiag (full-width masked dots, 8x lane util) is REJECTED by the
  remote compiler at every (dtype, r_tile) — re-confirmed on a healthy
  compile service (fast 500s, not the hang/outage class),
- headbatch (all heads in ONE batched dot pair, serial unroll removed)
  compiles and is bit-identical but measures FLAT (7.47 perhead vs 7.57
  headbatch ms at R=4096 bf16 r_tile=64) — so the serial head loop was
  never the bottleneck,
- r_tile 32/64/128 measure flat (rate-bound), 256+ hangs the compiler.
The residual levers live outside this kernel (conv chain, inter LSTM,
layout glue shared with DPCRN), where DPARN already matches DPCRN's
per-stream cost. scripts/exp_attn_blockdiag.py reproduces all of this.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


ATTN_LAYER_NAMES = ("wqT", "wkT", "wvT", "woT", "ln1_g", "ln1_b",
                    "ff1_k", "ff1_b", "ff2_k", "ff2_b", "ln2_g", "ln2_b")


def _perhead_attn(q2, k2, v2, rt, F, C, H, cast):
    """Per-head loop with 3-D ops only: Mosaic rejects the 4-D head
    transpose form on this toolchain (remote-compile 500); column slices +
    batch-0 dot_generals compile fine — but each head's dots are [F, Dh] x
    [Dh, F] with Dh = C/H (16 at the flagship), so every MXU pass runs at
    ~1/8 lane utilization and the batch unrolls serially."""
    Dh = C // H
    outs = []
    for hh in range(H):
        sl = slice(hh * Dh, (hh + 1) * Dh)
        qh = q2[:, sl].reshape(rt, F, Dh)
        kh = k2[:, sl].reshape(rt, F, Dh)
        vh = v2[:, sl].reshape(rt, F, Dh)
        logits = jax.lax.dot_general(
            cast(qh), cast(kh),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(Dh))
        weights = jax.nn.softmax(logits, axis=-1)
        outs.append(jax.lax.dot_general(
            cast(weights), cast(vh),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))  # [rt, F, Dh]
    return jnp.concatenate(outs, axis=-1).reshape(rt * F, C)


def _headbatch_attn(q2, k2, v2, rt, F, C, H, cast):
    """All heads in ONE batched dot pair: per-head column slices are
    concatenated along the BATCH axis ([H*rt, F, Dh]), so the 2*H serial
    per-head dot_generals become 2 batched ones. Lane utilization per MXU
    pass is unchanged (Dh=16), but the serial head unroll disappears —
    wins iff the per-head form is issue-latency bound rather than
    MXU-throughput bound. 3-D ops only (the 4-D transpose form is
    rejected by Mosaic on this toolchain)."""
    Dh = C // H

    def stack(a2):
        return jnp.concatenate(
            [a2[:, h * Dh:(h + 1) * Dh].reshape(rt, F, Dh)
             for h in range(H)], axis=0)

    qh, kh, vh = stack(q2), stack(k2), stack(v2)  # [H*rt, F, Dh]
    logits = jax.lax.dot_general(
        cast(qh), cast(kh),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(Dh))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        cast(weights), cast(vh),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H*rt, F, Dh]
    return jnp.concatenate(
        [out[h * rt:(h + 1) * rt] for h in range(H)],
        axis=-1).reshape(rt * F, C)


def _blockdiag_attn(q2, k2, v2, rt, F, C, H, cast):
    """All-heads-in-one-dot attention via static block-diagonal masks.

    Builds K_bd/V_bd [rt, H*F, C] by tiling K/V H times along the token
    axis and zeroing columns outside each block's head, so ONE batched
    [F, C] x [C, H*F] dot yields every head's logits side by side (the
    mask kills cross-head terms in the full-C contraction), and one
    [F, H*F] x [H*F, C] dot applies all heads' attention with the outputs
    landing in their head's column slice. 8x the per-head FLOPs (zeros),
    but the contractions are full-width (C=128 lanes) instead of Dh=16,
    and 2 batched dots replace 2*H.

    MEASURED RESULT (flagship geometry F=64 C=128 H=8, R=4096): FAILS the
    remote TPU compile (tpu_compile_helper 500) at every (dtype, r_tile)
    tried, f32/bf16 x 32/64 — same failure class as big-tile dual_path
    configs — while exact in interpret mode (129.5 dB vs perhead).
    Kept as a documented experiment; 'perhead' stays the default and only
    hardware-compilable variant (bf16 r_tile=64: 7.5 ms at R=4096)."""
    Dh = C // H
    HF = H * F
    q3 = q2.reshape(rt, F, C)
    k3 = k2.reshape(rt, F, C)
    v3 = v2.reshape(rt, F, C)
    # mask[h*F+g, c] = 1 iff column c belongs to head h
    row_h = jax.lax.broadcasted_iota(jnp.int32, (HF, C), 0) // F
    col_h = jax.lax.broadcasted_iota(jnp.int32, (HF, C), 1) // Dh
    mask = (row_h == col_h).astype(jnp.float32)
    k_bd = jnp.concatenate([k3] * H, axis=1) * mask  # [rt, HF, C]
    v_bd = jnp.concatenate([v3] * H, axis=1) * mask
    logits = jax.lax.dot_general(
        cast(q3), cast(k_bd),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(Dh))
    weights = jax.nn.softmax(
        logits.reshape(rt * F, H, F), axis=-1).reshape(rt, F, HF)
    out = jax.lax.dot_general(
        cast(weights), cast(v_bd),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [rt, F, C]
    return out.reshape(rt * F, C)


def attention_encoder_layer(x, pe, w, H, dot, cast=lambda a: a,
                            variant: str = "perhead"):
    """x: [rt, F, C] f32. One MhaSelfAttenLayer, deterministic. Shared by
    the intra-attention kernel and the DPARN center-fused masker kernel
    (ops/masker_kernel.dparn_center_chunk). `cast` sets the dtype of the
    3-D attention dot_general operands (bf16 in serving mode)."""
    rt, F, C = x.shape
    src = x
    xq = x + pe if pe is not None else x
    x2 = xq.reshape(rt * F, C)

    q2 = dot(x2, w["wqT"])
    k2 = dot(x2, w["wkT"])
    v2 = dot(x2, w["wvT"])
    attn = {"blockdiag": _blockdiag_attn,
            "headbatch": _headbatch_attn}.get(variant, _perhead_attn)
    out = attn(q2, k2, v2, rt, F, C, H, cast)
    out = dot(out, w["woT"]).reshape(rt, F, C)
    x = _ln(src + out, w["ln1_g"][:], w["ln1_b"][:])
    src = x
    ff = dot(x.reshape(rt * F, C), w["ff1_k"]) + w["ff1_b"][:]
    ff = jnp.maximum(ff, 0.0)
    ff = dot(ff, w["ff2_k"]) + w["ff2_b"][:]
    return _ln(src + ff.reshape(rt, F, C), w["ln2_g"][:], w["ln2_b"][:])


def _make_kernel(H: int, with_pe: tuple, dot_dtype, variant: str = "perhead"):
    n_layers = len(with_pe)

    def dot(a, w_ref):
        return jnp.dot(a.astype(dot_dtype), w_ref[:].astype(dot_dtype),
                       preferred_element_type=jnp.float32)

    def encoder_layer(x, pe, w):
        return attention_encoder_layer(x, pe, w, H, dot,
                                       cast=lambda a: a.astype(dot_dtype),
                                       variant=variant)

    def kernel(x_ref, pe_ref, *refs):
        y_ref = refs[-1]
        weight_refs = list(refs[:-1])
        names = ("wqT", "wkT", "wvT", "woT", "ln1_g", "ln1_b",
                 "ff1_k", "ff1_b", "ff2_k", "ff2_b", "ln2_g", "ln2_b")
        layers = []
        idx = 0
        for _ in range(n_layers):
            layers.append({n: weight_refs[idx + j]
                           for j, n in enumerate(names)})
            idx += len(names)
        fc_k, fc_b, nrm_g, nrm_b = weight_refs[idx:idx + 4]

        x = x_ref[:].astype(jnp.float32)
        pe = pe_ref[:].astype(jnp.float32)
        for li in range(n_layers):
            x = encoder_layer(x, pe if with_pe[li] else None, layers[li])
        rt, F, C = x.shape
        h = (jnp.dot(x.reshape(rt * F, C).astype(dot_dtype),
                     fc_k[:].astype(dot_dtype),
                     preferred_element_type=jnp.float32)
             + fc_b[:]).reshape(rt, F, C)
        y_ref[:] = _ln(h, nrm_g[:], nrm_b[:]).astype(y_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("heads", "r_tile", "interpret",
                                             "dot_dtype", "variant"))
def dparn_intra_pass(x, pe, weights, heads: int, r_tile: int = 64,
                     interpret: bool = False, dot_dtype=jnp.float32,
                     variant: str = "perhead"):
    """Fused intra pass: 2 encoder layers + FC + LayerNormLast.

    Args:
        x: [R, F, C] rows of frequency tokens (R = streams * frames).
        pe: [F, C] sinusoidal positions (layer 1 only).
        weights: flat tuple — for each of the 2 layers
            (wqT, wkT, wvT, woT, ln1_g, ln1_b, ff1_k, ff1_b, ff2_k, ff2_b,
            ln2_g, ln2_b) then (fc_k, fc_b, norm_g, norm_b). Projections are
            pre-transposed for right-multiplication.
    Returns: [R, F, C] — the value DPARNblock2D adds to its residual.
    """
    R, F, C = x.shape
    if r_tile <= 0 or r_tile > R:
        r_tile = R
    while R % r_tile:
        r_tile -= 1
    grid = (R // r_tile,)

    in_specs = [
        pl.BlockSpec((r_tile, F, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(pe.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))

    kernel = _make_kernel(heads, (True, False), dot_dtype, variant)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_tile, F, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, F, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, pe, *weights)
