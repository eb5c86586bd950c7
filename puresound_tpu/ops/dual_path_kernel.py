"""Pallas TPU kernel: fused DPCRN dual-path bottleneck (both blocks).

The NS streaming breakdown (round 2) put 70% of the 16 ms chunk step in
the two DPRNNblock2D blocks: each block round-trips the [B, CH, F, K]
activation and its [B*K, F, 4H] / [B*F, K, 4H] LSTM intermediates through
HBM between the intra scan, projections, norms, residuals, and the inter
scan — ~10.8 ms of the 15.4 ms step at B=2048 (bf16).

This kernel runs BOTH blocks for a whole chunk with everything VMEM
resident per stream tile:

- grid over stream tiles (b_tile streams per program)
- per program: the [K, F, bt, CH] activation lives in VMEM scratch across
  intra fwd/bwd scans, projections, layer norms, residuals, and the inter
  scan of both blocks — the only HBM traffic is x in, y out, the four
  inter carries, and one weight read
- intra scan: fori over F with [bt, CH]x[CH, 4H] + [bt, H]x[H, 4H] MXU
  dots per step; per-direction outputs accumulate in VMEM scratch
- intra projection: one [F*bt, H]x[H, CH] dot per direction (MXU)
- inter scan: K steps over [F*bt, CH] rows (single big MXU dot per step)

Numerics match DPRNNblock2D.step_chunk exactly (LayerNormLast eps 1e-5,
torch LSTM gate order, double bias). Inter carries use the kernel-native
[F, B, H] layout (the stock path's [1, B*F, H] is B-outer) — created by
`init_carries`.
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


def _lstm_gates(gates, c, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


# per-block weight order (18 arrays):
#   intra fwd: w_ih_f [CH,4H], w_hh_f [H,4H], b_f [4H]
#   intra bwd: w_ih_b, w_hh_b, b_b
#   intra proj: pw_f [H,CH], pw_b [H,CH], pb [CH]  (Dense kernel split by dir)
#   intra norm: ig [CH], ib [CH]
#   inter: w_ih_i [CH,4H], w_hh_i [H,4H], b_i [4H]
#   inter proj: pw_i [H,CH], pb_i [CH]
#   inter norm: tg [CH], tb [CH]
_PER_BLOCK = 18


def make_dots(dot_dtype, int8_hh: bool = False):
    """(dot, dot_hh) closures shared by the fused dual-path kernels."""
    def dot(a, w_ref):
        return jnp.dot(a.astype(dot_dtype), w_ref[:].astype(dot_dtype),
                       preferred_element_type=jnp.float32)

    def dot_hh(h, w_ref, scale_ref):
        """Recurrent-state dot: int8 MXU path when enabled. LSTM h is
        tanh-bounded, so the 1/127 activation scale is exact-range; w is
        per-output-column quantized outside (see skim_stream_kernel)."""
        if not int8_hh:
            return dot(h, w_ref)
        hq = jnp.clip(jnp.round(h * 127.0), -127.0, 127.0).astype(jnp.int8)
        acc = jnp.dot(hq, w_ref[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (scale_ref[:] / (127.0 * 127.0))

    return dot, dot_hh


def _block_weights(w_refs, b: int, int8_hh: bool) -> dict:
    """Name-map one block's slice of the flat weight-ref tuple."""
    PB = _PER_BLOCK + (3 if int8_hh else 0)
    sc = lambda n: ([f"s_{n}"] if int8_hh else [])
    names = (["w_ih_f", "w_hh_f"] + sc("hh_f") + ["b_f"]
             + ["w_ih_b", "w_hh_b"] + sc("hh_b") + ["b_b"]
             + ["pw_f", "pw_b", "pb", "ig", "ib"]
             + ["w_ih_i", "w_hh_i"] + sc("hh_i")
             + ["b_i", "pw_i", "pb_i", "tg", "tb"])
    return {name: w_refs[b * PB + j] for j, name in enumerate(names)}


def dual_path_body(dot, dot_hh, x_scr, yf_scr, yb_scr, w_refs,
                   h_in, c_in, h_out, c_out,
                   n_blocks: int, K: int, F: int, H: int, bt: int,
                   int8_hh: bool, row0: int = 0):
    """Run all dual-path blocks in place on x_scr [F, row0 + K*bt, CH]
    (rows [row0:] are the (frame, stream)-flattened activation; rows
    before row0 — e.g. a carried previous frame kept by a surrounding
    fused conv — are left untouched). Shared by dual_path_chunk and the
    center-fused masker kernel (ops/masker_kernel.py)."""
    CH = x_scr.shape[-1]
    R = K * bt

    for b in range(n_blocks):
        w = _block_weights(w_refs, b, int8_hh)

        # -------- intra (frequency) pass: fwd + bwd fused per step ----
        zero = jnp.zeros((R, H), jnp.float32)

        def intra_step(f, carry):
            hf, cf, hb, cb = carry
            xf = x_scr[f, row0:, :]
            gf = (dot(xf, w["w_ih_f"])
                  + dot_hh(hf, w["w_hh_f"], w.get("s_hh_f"))
                  + w["b_f"][:])
            hf, cf = _lstm_gates(gf, cf, H)
            yf_scr[f] = hf.astype(yf_scr.dtype)
            fb = F - 1 - f
            xb = x_scr[fb, row0:, :]
            gb = (dot(xb, w["w_ih_b"])
                  + dot_hh(hb, w["w_hh_b"], w.get("s_hh_b"))
                  + w["b_b"][:])
            hb, cb = _lstm_gates(gb, cb, H)
            yb_scr[fb] = hb.astype(yb_scr.dtype)
            return (hf, cf, hb, cb)

        jax.lax.fori_loop(0, F, intra_step, (zero, zero, zero, zero))

        # projection of both directions + LN + residual; chunked over F
        # to bound the Mosaic stack temporaries (VMEM); finer chunks at
        # wider tiles
        n_pchunk = 8 if (R >= 512 and F % 8 == 0) else (
            4 if F % 4 == 0 else (2 if F % 2 == 0 else 1))
        pc = F // n_pchunk
        for p0 in range(0, F, pc):
            yf = yf_scr[p0:p0 + pc].reshape(pc * R, H)
            yb = yb_scr[p0:p0 + pc].reshape(pc * R, H)
            t = dot(yf, w["pw_f"]) + dot(yb, w["pw_b"]) + w["pb"][:]
            t = _ln(t, w["ig"][:], w["ib"][:])
            x_scr[p0:p0 + pc, row0:, :] = (
                x_scr[p0:p0 + pc, row0:, :]
                + t.reshape(pc, R, CH)).astype(x_scr.dtype)

        # ---------------- inter (time) pass, K carried steps ----------
        # rows are (freq, stream)-independent: chunk F to keep the
        # [rows, 4H] gate temporaries inside the VMEM budget
        n_ichunk = 4 if (bt >= 256 and F % 4 == 0) else (
            2 if F % 2 == 0 else 1)
        ic = F // n_ichunk
        for p0 in range(0, F, ic):
            h = h_in[b][p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
            c = c_in[b][p0:p0 + ic].astype(jnp.float32).reshape(ic * bt, H)
            for k in range(K):
                lo, hi = row0 + k * bt, row0 + (k + 1) * bt
                rows = x_scr[p0:p0 + ic, lo:hi, :].reshape(ic * bt, CH)
                gates = (dot(rows, w["w_ih_i"])
                         + dot_hh(h, w["w_hh_i"], w.get("s_hh_i"))
                         + w["b_i"][:])
                h, c = _lstm_gates(gates, c, H)
                t = dot(h, w["pw_i"]) + w["pb_i"][:]
                t = _ln(t, w["tg"][:], w["tb"][:])
                x_scr[p0:p0 + ic, lo:hi, :] = (
                    x_scr[p0:p0 + ic, lo:hi, :]
                    + t.reshape(ic, bt, CH)).astype(x_scr.dtype)
            h_out[b][p0:p0 + ic] = h.reshape(ic, bt, H).astype(h_out[b].dtype)
            c_out[b][p0:p0 + ic] = c.reshape(ic, bt, H).astype(c_out[b].dtype)


def dual_path_body_multi(dot, dot_hh, x_scrs, yf_scrs, yb_scrs, w_refs,
                         h_in, c_in, h_out, c_out,
                         n_blocks: int, K: int, F: int, H: int, bt: int,
                         int8_hh: bool):
    """T-sub-tile variant of dual_path_body: one grid program advances T
    independent stream tiles in lockstep, so each serial scan iteration
    does T tiles' worth of dots/gates — T-fold fewer sequential
    iterations than running the tiles as separate grid programs, while
    every ref block AND vector temporary stays [.., bt, ..]-shaped (the
    sizes known to compile on this toolchain; both the whole-tile
    b_tile=256 form and 256-wide block specs crash the remote compiler).

    x_scrs/yf_scrs/yb_scrs: length-T lists of [F, K*bt, .] scratch refs.
    h_in/c_in/h_out/c_out: per-block lists of length-T ref lists, each
    ref an [F, bt, H] block (sub-tile t's own full-width block).
    """
    T = len(x_scrs)
    CH = x_scrs[0].shape[-1]
    R = K * bt

    for b in range(n_blocks):
        w = _block_weights(w_refs, b, int8_hh)

        # -------- intra (frequency) pass: fwd + bwd x T tiles per step --
        zero = jnp.zeros((R, H), jnp.float32)

        def intra_step(f, carry):
            fb = F - 1 - f
            out = []
            for t in range(T):
                hf, cf, hb, cb = carry[4 * t:4 * t + 4]
                gf = (dot(x_scrs[t][f], w["w_ih_f"])
                      + dot_hh(hf, w["w_hh_f"], w.get("s_hh_f"))
                      + w["b_f"][:])
                hf, cf = _lstm_gates(gf, cf, H)
                yf_scrs[t][f] = hf.astype(yf_scrs[t].dtype)
                gb = (dot(x_scrs[t][fb], w["w_ih_b"])
                      + dot_hh(hb, w["w_hh_b"], w.get("s_hh_b"))
                      + w["b_b"][:])
                hb, cb = _lstm_gates(gb, cb, H)
                yb_scrs[t][fb] = hb.astype(yb_scrs[t].dtype)
                out += [hf, cf, hb, cb]
            return tuple(out)

        jax.lax.fori_loop(0, F, intra_step, tuple([zero] * (4 * T)))

        # projection of both directions + LN + residual (per sub-tile)
        n_pchunk = 8 if (R >= 512 and F % 8 == 0) else (
            4 if F % 4 == 0 else (2 if F % 2 == 0 else 1))
        pc = F // n_pchunk
        for p0 in range(0, F, pc):
            for t in range(T):
                yf = yf_scrs[t][p0:p0 + pc].reshape(pc * R, H)
                yb = yb_scrs[t][p0:p0 + pc].reshape(pc * R, H)
                v = dot(yf, w["pw_f"]) + dot(yb, w["pw_b"]) + w["pb"][:]
                v = _ln(v, w["ig"][:], w["ib"][:])
                x_scrs[t][p0:p0 + pc] = (
                    x_scrs[t][p0:p0 + pc]
                    + v.reshape(pc, R, CH)).astype(x_scrs[t].dtype)

        # ---------------- inter (time) pass: K steps x T tiles ----------
        n_ichunk = 4 if (bt >= 256 and F % 4 == 0) else (
            2 if F % 2 == 0 else 1)
        ic = F // n_ichunk
        for p0 in range(0, F, ic):
            hs = [h_in[b][t][p0:p0 + ic].astype(jnp.float32)
                  .reshape(ic * bt, H) for t in range(T)]
            cs = [c_in[b][t][p0:p0 + ic].astype(jnp.float32)
                  .reshape(ic * bt, H) for t in range(T)]
            for k in range(K):
                lo, hi = k * bt, (k + 1) * bt
                for t in range(T):
                    rows = x_scrs[t][p0:p0 + ic, lo:hi, :].reshape(
                        ic * bt, CH)
                    gates = (dot(rows, w["w_ih_i"])
                             + dot_hh(hs[t], w["w_hh_i"], w.get("s_hh_i"))
                             + w["b_i"][:])
                    hs[t], cs[t] = _lstm_gates(gates, cs[t], H)
                    v = dot(hs[t], w["pw_i"]) + w["pb_i"][:]
                    v = _ln(v, w["tg"][:], w["tb"][:])
                    x_scrs[t][p0:p0 + ic, lo:hi, :] = (
                        x_scrs[t][p0:p0 + ic, lo:hi, :]
                        + v.reshape(ic, bt, CH)).astype(x_scrs[t].dtype)
            for t in range(T):
                h_out[b][t][p0:p0 + ic] = hs[t].reshape(
                    ic, bt, H).astype(h_out[b][t].dtype)
                c_out[b][t][p0:p0 + ic] = cs[t].reshape(
                    ic, bt, H).astype(c_out[b][t].dtype)


def _make_kernel(n_blocks: int, K: int, F: int, H: int, dot_dtype,
                 int8_hh: bool = False):
    # NOTE: x_scr's dtype follows the scratch shape passed by the caller
    # (f32 by default; bf16 under xscr_half to halve VMEM for bigger
    # stream tiles) — all arithmetic stays f32, writes cast to the ref.
    dot, dot_hh = make_dots(dot_dtype, int8_hh)

    def kernel(x_ref, *refs):
        # refs: h_in[b], c_in[b] per block ... weights ... y, h_out[b],
        # c_out[b], scratch: x_scr [F,K*bt,CH], yf_scr/yb_scr [F,K*bt,H]
        PB = _PER_BLOCK + (3 if int8_hh else 0)
        n_carry = 2 * n_blocks
        h_in = refs[:n_blocks]
        c_in = refs[n_blocks:n_carry]
        w_refs = refs[n_carry:n_carry + PB * n_blocks]
        y_ref = refs[n_carry + PB * n_blocks]
        h_out = refs[n_carry + PB * n_blocks + 1:
                     n_carry + PB * n_blocks + 1 + n_blocks]
        c_out = refs[-3 - n_blocks:-3]
        x_scr, yf_scr, yb_scr = refs[-3], refs[-2], refs[-1]

        bt = x_ref.shape[2]
        CH = x_ref.shape[3]
        R = K * bt  # rows per intra step: both frames' streams batch together
        # x arrives [F, K, bt, CH]; flatten (K, bt) so every dynamic index
        # stays on the leading axis (Mosaic-safe) and each serial scan step
        # carries K*bt rows — 4x fewer sequential iterations than scanning
        # per frame per direction.
        x_scr[:] = x_ref[:].reshape(F, R, CH).astype(x_scr.dtype)

        dual_path_body(dot, dot_hh, x_scr, yf_scr, yb_scr, w_refs,
                       h_in, c_in, h_out, c_out,
                       n_blocks, K, F, H, bt, int8_hh)

        y_ref[:] = x_scr[:].reshape(F, K, bt, CH).astype(y_ref.dtype)

    return kernel


def _make_kernel_multi(n_blocks: int, K: int, F: int, H: int, dot_dtype,
                       T: int, int8_hh: bool = False):
    """Kernel processing T independent bt-wide sub-tiles per grid program.

    Every sub-tile has its OWN input/output/carry refs (separate
    [F, K, bt, CH] / [F, bt, H] block specs into the same HBM arrays) —
    block shapes never exceed the single-tile sizes, which is what this
    toolchain's remote compiler accepts (see dual_path_body_multi).
    Ref order: x_t (T), h_in[b][t] (n_blocks*T), c_in[b][t], weights,
    y_t (T), h_out[b][t], c_out[b][t], scratch x_scr_t/yf_t/yb_t (3T).
    """
    dot, dot_hh = make_dots(dot_dtype, int8_hh)

    def kernel(*refs):
        PB = _PER_BLOCK + (3 if int8_hh else 0)
        nbt = n_blocks * T
        x_refs = refs[:T]
        group = lambda flat: [list(flat[b * T:(b + 1) * T])
                              for b in range(n_blocks)]
        h_in = group(refs[T:T + nbt])
        c_in = group(refs[T + nbt:T + 2 * nbt])
        w0 = T + 2 * nbt
        w_refs = refs[w0:w0 + PB * n_blocks]
        y0 = w0 + PB * n_blocks
        y_refs = refs[y0:y0 + T]
        h_out = group(refs[y0 + T:y0 + T + nbt])
        c_out = group(refs[y0 + T + nbt:y0 + T + 2 * nbt])
        scr = refs[-3 * T:]
        x_scrs, yf_scrs, yb_scrs = scr[:T], scr[T:2 * T], scr[2 * T:]

        bt = x_refs[0].shape[2]
        CH = x_refs[0].shape[3]
        for t in range(T):
            x_scrs[t][:] = x_refs[t][:].reshape(F, K * bt, CH).astype(
                x_scrs[t].dtype)

        dual_path_body_multi(dot, dot_hh, x_scrs, yf_scrs, yb_scrs, w_refs,
                             h_in, c_in, h_out, c_out,
                             n_blocks, K, F, H, bt, int8_hh)

        for t in range(T):
            y_refs[t][:] = x_scrs[t][:].reshape(F, K, bt, CH).astype(
                y_refs[t].dtype)

    return kernel


def init_carries(n_blocks: int, F: int, batch: int, H: int,
                 dtype=jnp.float32):
    """Kernel-native inter-LSTM carries: per block (h, c) of [F, B, H]."""
    z = lambda: jnp.zeros((F, batch, H), dtype)
    return [z() for _ in range(n_blocks)], [z() for _ in range(n_blocks)]


@functools.partial(jax.jit, static_argnames=(
    "b_tile", "interpret", "dot_dtype", "int8_hh", "xscr_half",
    "sub_tiles"))
def dual_path_chunk(x, h_in, c_in, weights, b_tile: int = 128,
                    interpret: bool = False, dot_dtype=jnp.float32,
                    int8_hh: bool = False, xscr_half: bool = False,
                    sub_tiles: int = 1):
    """Run a chunk through all dual-path blocks with VMEM-resident state.

    Args:
        x: [F, K, B, CH] bottleneck activations (freq-major).
        h_in/c_in: per-block lists of [F, B, H] inter carries.
        weights: flat tuple, _PER_BLOCK arrays per block (see module doc).
        sub_tiles: T>1 advances T independent b_tile-wide stream tiles per
            grid program in lockstep (T-fold fewer serial scan iterations;
            the kernel is per-iteration latency bound). All vector
            temporaries stay b_tile-row-sized — unlike raising b_tile,
            which crashes the remote compiler past 128.

    Returns: (y [F, K, B, CH], h_out, c_out — same structure as h_in).
    """
    F, K, B, CH = x.shape
    n_blocks = len(h_in)
    H = h_in[0].shape[-1]
    T = sub_tiles
    bw = b_tile * T  # streams per grid program (block width)
    assert B % bw == 0, f"stream batch {B} must tile by {b_tile}x{T}"
    n_tiles = B // bw

    if T == 1:
        kernel = _make_kernel(n_blocks, K, F, H, dot_dtype, int8_hh=int8_hh)
    else:
        kernel = _make_kernel_multi(n_blocks, K, F, H, dot_dtype, T,
                                    int8_hh=int8_hh)

    grid = (n_tiles,)
    # Per-sub-tile block specs: sub-tile t of program i covers streams
    # [t*(B/T) + i*b_tile, ...) — contiguous T-th slices of the batch, so
    # the per-sub-tile outputs reassemble with one concatenate. Block
    # shapes stay at the single-tile sizes (wider blocks crash the
    # remote compiler).
    spec_x_t = [pl.BlockSpec((F, K, b_tile, CH),
                             lambda i, _t=t: (0, 0, _t * n_tiles + i, 0),
                             memory_space=pltpu.VMEM) for t in range(T)]
    spec_carry_t = [pl.BlockSpec((F, b_tile, H),
                                 lambda i, _t=t: (0, _t * n_tiles + i, 0),
                                 memory_space=pltpu.VMEM) for t in range(T)]
    spec_out_x = [pl.BlockSpec((F, K, b_tile, CH), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM)] * T
    spec_out_carry = [pl.BlockSpec((F, b_tile, H), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)] * T

    in_specs = (spec_x_t
                + spec_carry_t * n_blocks      # h_in[b] x T specs each
                + spec_carry_t * n_blocks)     # c_in[b]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                                     memory_space=pltpu.VMEM))

    Bs = B // T  # streams per sub-tile output array
    out_shape = ([jax.ShapeDtypeStruct((F, K, Bs, CH), x.dtype)] * T
                 + [jax.ShapeDtypeStruct((F, Bs, H), h_in[0].dtype)
                    for _ in range(2 * n_blocks * T)])
    out_specs = spec_out_x + spec_out_carry * (2 * n_blocks)

    # direction buffers only feed the (dot_dtype) projection dots — store
    # them at dot precision to halve their VMEM in serving mode.
    # xscr_half additionally stores the residual activation scratch in
    # bf16 (arithmetic stays f32), halving the dominant VMEM buffer.
    scr_dt = jnp.bfloat16 if dot_dtype == jnp.bfloat16 else jnp.float32
    x_scr_dt = jnp.bfloat16 if xscr_half else jnp.float32
    scratch_shapes = (
        [pltpu.VMEM((F, K * b_tile, CH), x_scr_dt)] * T
        + [pltpu.VMEM((F, K * b_tile, H), scr_dt)] * (2 * T))

    operands = ([x] * T
                + [h for h in h_in for _ in range(T)]
                + [c for c in c_in for _ in range(T)]
                + list(weights))
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
    )(*operands)
    if T == 1:
        y = outs[0]
        h_out = list(outs[1:1 + n_blocks])
        c_out = list(outs[1 + n_blocks:])
        return y, h_out, c_out
    y = jnp.concatenate(outs[:T], axis=2)
    cat = lambda flat, b: jnp.concatenate(flat[b * T:(b + 1) * T], axis=1)
    h_flat = outs[T:T + n_blocks * T]
    c_flat = outs[T + n_blocks * T:]
    h_out = [cat(h_flat, b) for b in range(n_blocks)]
    c_out = [cat(c_flat, b) for b in range(n_blocks)]
    return y, h_out, c_out
