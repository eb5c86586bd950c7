"""Pallas TPU kernels: LSTM recurrence scan for TRAINING (fwd + custom VJP).

Round-2 measurement: the flagship train step is scan-iteration bound — each
`lax.scan` LSTM step is a [B, H] x [H, 4H] matmul of a few hundred MFLOP
(microseconds on the MXU) wrapped in per-iteration while-loop overhead and
HBM round-trips of the carry, in BOTH the forward and the backward pass
(~1200 serial iterations per step for the 4-block SkiM at seg_size 150).

These kernels run the whole recurrence inside one Pallas program per pass:

- forward: carry VMEM-resident, streams xp[t] in and h[t] out, and
  additionally stores the ACTIVATED gates (i, f, g, o) and the cell-state
  sequence — exactly the residuals the backward needs, so the backward
  never re-runs the recurrence matmul.
- backward: reverse-time scan with (dh, dc) VMEM-resident, two MXU matmuls
  per step (dgates @ w_hh^T and the dw_hh accumulation, which lives in a
  f32 VMEM scratch across the whole scan).

`lstm_scan_train` wraps them in jax.custom_vjp; gradients of the input
projection / embedding terms fall out of autodiff through xp as usual.
Gate order matches torch / LSTMCellParams (i, f, g, o).

Serving counterpart (no residual stores): ops/lstm_scan_kernel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm_scan_kernel import pick_b_tile  # noqa: F401  (re-export)


def _fwd_kernel(nT: int, u: int, reverse: bool, dot_dtype):
    """u = time steps per grid iteration (python-unrolled inside the body;
    amortizes the per-iteration pipeline latency — the per-step matmul is
    ~1 us of MXU against ~7 us of grid overhead at u=1)."""

    def kernel(xp_ref, h0_ref, c0_ref, whh_ref,
               y_ref, hT_ref, cT_ref, gates_ref, cseq_ref,
               h_scr, c_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:].astype(jnp.float32)
            c_scr[:] = c0_ref[:].astype(jnp.float32)

        h = h_scr[:]
        c = c_scr[:]
        H = h.shape[-1]
        for kk in range(u):
            k = u - 1 - kk if reverse else kk
            gates = (xp_ref[k].astype(jnp.float32)
                     + jnp.dot(h.astype(dot_dtype),
                               whh_ref[:].astype(dot_dtype),
                               preferred_element_type=jnp.float32))
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            y_ref[k] = h.astype(y_ref.dtype)
            gates_ref[k] = jnp.concatenate([i, f, g, o], axis=-1
                                           ).astype(gates_ref.dtype)
            cseq_ref[k] = c.astype(cseq_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c

        @pl.when(t == nT - 1)
        def _():
            hT_ref[:] = h.astype(hT_ref.dtype)
            cT_ref[:] = c.astype(cT_ref.dtype)

    return kernel


def _bwd_kernel(nT: int, nb: int, u: int, fwd_reverse: bool, dot_dtype):
    """Walks time blocks in the OPPOSITE order of the forward; inside a
    block, steps run in reverse of the forward's within-block order."""

    def kernel(gates_ref, cseq_ref, cprev_ref, hprev_ref, dy_ref,
               dhT_ref, dcT_ref, whh_ref,
               dxp_ref, dh0_ref, dc0_ref, dwhh_ref,
               dh_scr, dc_scr, dw_scr):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dh_scr[:] = dhT_ref[:].astype(jnp.float32)
            dc_scr[:] = dcT_ref[:].astype(jnp.float32)
            dw_scr[:] = jnp.zeros_like(dw_scr)

        H = dh_scr.shape[-1]
        dh_c = dh_scr[:]
        dc_c = dc_scr[:]
        dw = jnp.zeros_like(dw_scr)
        for kk in range(u):
            # forward within-block order is ascending k (or descending when
            # the forward itself is reversed); backward visits the opposite
            k = kk if fwd_reverse else u - 1 - kk
            gates = gates_ref[k].astype(jnp.float32)
            i = gates[:, :H]
            f = gates[:, H:2 * H]
            g = gates[:, 2 * H:3 * H]
            o = gates[:, 3 * H:]
            c_new = cseq_ref[k].astype(jnp.float32)
            c_prev = cprev_ref[k].astype(jnp.float32)
            tanh_c = jnp.tanh(c_new)

            dh = dh_c + dy_ref[k].astype(jnp.float32)
            dc = dc_c + dh * o * (1.0 - tanh_c * tanh_c)
            dgo = dh * tanh_c * o * (1.0 - o)
            dgf = dc * c_prev * f * (1.0 - f)
            dgi = dc * g * i * (1.0 - i)
            dgg = dc * i * (1.0 - g * g)
            dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)

            dxp_ref[k] = dgates.astype(dxp_ref.dtype)
            dh_c = jnp.dot(dgates.astype(dot_dtype),
                           whh_ref[:].astype(dot_dtype).T,
                           preferred_element_type=jnp.float32)
            dc_c = dc * f
            dw += jnp.dot(hprev_ref[k].astype(dot_dtype).T,
                          dgates.astype(dot_dtype),
                          preferred_element_type=jnp.float32)
        dh_scr[:] = dh_c
        dc_scr[:] = dc_c
        dw_scr[:] += dw

        @pl.when(t == nT - 1)
        def _():
            dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
            dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)

        @pl.when((t == nT - 1) & (b == 0))
        def _():
            dwhh_ref[:] = dw_scr[:].astype(dwhh_ref.dtype)

        @pl.when((t == nT - 1) & (b > 0))
        def _():
            dwhh_ref[:] += dw_scr[:].astype(dwhh_ref.dtype)

    return kernel


def _tmap(reverse: bool, T: int):
    if reverse:
        return lambda b, t: (T - 1 - t, b, 0)
    return lambda b, t: (t, b, 0)


def _pick_u(T: int) -> int:
    """Time steps per grid iteration. Measured on v5e at the flagship
    shapes (896x150x256): u=6 is NOT faster than u=1 (2.30 vs 2.06 ms fwd)
    — the kernel is VPU-bound on the gate transcendentals (sigmoid/tanh
    over [b_tile, 4H] per step ~6 us vs ~1.2 us of MXU), so batching grid
    iterations buys nothing. Kept at 1; the u-machinery stays for shapes
    where the balance differs."""
    return 1


def _fwd_call(xp_t, h0, c0, w_hh, reverse, b_tile, interpret, dot_dtype):
    T, B, H4 = xp_t.shape
    H = H4 // 4
    nb = B // b_tile
    u = _pick_u(T)
    nT = T // u
    tmap = _tmap(reverse, nT)
    bmap = lambda b, t: (b, 0)
    kernel = _fwd_kernel(nT, u, reverse, dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb, nT),
        in_specs=[
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), xp_t.dtype),
            jax.ShapeDtypeStruct((B, H), h0.dtype),
            jax.ShapeDtypeStruct((B, H), c0.dtype),
            jax.ShapeDtypeStruct((T, B, H4), xp_t.dtype),  # activated gates
            jax.ShapeDtypeStruct((T, B, H), xp_t.dtype),   # cell states
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp_t, h0, c0, w_hh)


def _bwd_call(gates, cseq, cprev, hprev, dy_t, dhT, dcT, w_hh,
              reverse, b_tile, interpret, dot_dtype):
    T, B, H4 = gates.shape
    H = H4 // 4
    nb = B // b_tile
    u = _pick_u(T)
    nT = T // u
    # the backward scan walks time blocks in the OPPOSITE order of the
    # forward (within-block reversal happens inside the kernel body)
    tmap = _tmap(not reverse, nT)
    bmap = lambda b, t: (b, 0)
    kernel = _bwd_kernel(nT, nb, u, reverse, dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb, nT),
        in_specs=[
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H4), gates.dtype),  # dxp
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gates, cseq, cprev, hprev, dy_t, dhT, dcT, w_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def lstm_scan_train_tm(xp_t, h0, c0, w_hh, reverse: bool = False,
                       b_tile: int = 0, interpret: bool = False,
                       dot_dtype=jnp.float32):
    """Differentiable fused LSTM scan, TIME-MAJOR end to end.

    xp_t [T, B, 4H] hoisted input projections, h0/c0 [B, H], w_hh [H, 4H].
    Returns (y_t [T, B, H], hT [B, H], cT [B, H]).

    Time-major is the kernel's native layout; this entry point avoids the
    [B, T, 4H] <-> [T, B, 4H] transposes the batch-major wrapper pays —
    at the flagship training shapes those were ~275 MB HBM round trips per
    SkiM block per pass (the 4H-wide xp/dxp tensors), on a step measured
    HBM-bound (backward at ~81% of peak bandwidth). Callers transpose the
    4x-narrower x instead and project time-major (rnn.LSTMCellParams.scan).
    """
    y_t, hT, cT, _, _ = _run_fwd(xp_t, h0, c0, w_hh, reverse, b_tile,
                                 interpret, dot_dtype)
    return y_t, hT, cT


def _resolve_tile(B, b_tile):
    """Resolve a batch tile to a hardware-legal divisor of B.

    NOTE: an explicitly requested non-8-aligned tile (e.g. b_tile=33 at
    B=66) is silently promoted to the nearest legal choice — possibly the
    whole batch — which can raise the VMEM footprint beyond what the
    caller sized for. The request was hardware-illegal anyway (TPU block
    rule below); pass an 8-multiple divisor to keep control of the
    footprint (tested: test_lstm_train_tile_resolution_is_hw_legal)."""
    if b_tile <= 0 or b_tile > B:
        b_tile = pick_b_tile(B, cap=512)
    while B % b_tile:
        b_tile -= 1
    # TPU block rule: a (u, b_tile, *) block's second-to-last dim must be
    # divisible by 8 OR equal the array dim. Decrementing to a divisor can
    # land on a non-multiple of 8 (e.g. 66 rows -> 33), which passes
    # interpret mode but fails the hardware lowering (hit via inference
    # routed through the train scan with odd row counts, round 4) — pick
    # the largest 8-multiple divisor instead, else run the batch whole.
    if b_tile != B and b_tile % 8:
        aligned = next((t for t in range(b_tile - b_tile % 8, 7, -8)
                        if B % t == 0), 0)
        b_tile = aligned or B
    return b_tile


def _run_fwd(xp_t, h0, c0, w_hh, reverse, b_tile, interpret, dot_dtype):
    T, B, H4 = xp_t.shape
    b_tile = _resolve_tile(B, b_tile)
    return _fwd_call(
        xp_t, h0, c0, w_hh, reverse, b_tile, interpret, dot_dtype)


def _fwd_rule(xp_t, h0, c0, w_hh, reverse, b_tile, interpret, dot_dtype):
    y_t, hT, cT, gates, cseq = _run_fwd(xp_t, h0, c0, w_hh, reverse, b_tile,
                                        interpret, dot_dtype)
    return (y_t, hT, cT), (gates, cseq, c0, h0, y_t, w_hh)


def _bwd_rule(reverse, b_tile, interpret, dot_dtype, res, cts):
    gates, cseq, c0, h0, y_t, w_hh = res
    dy_t, dhT, dcT = cts
    T, B, H4 = gates.shape
    H = H4 // 4
    b_tile = _resolve_tile(B, b_tile)

    if reverse:
        # forward visited t = T-1 .. 0; "previous" state of visit k is the
        # state after visit k-1, i.e. time index t+1
        hprev = jnp.concatenate([y_t[1:], h0[None].astype(y_t.dtype)],
                                axis=0)
        cprev = jnp.concatenate([cseq[1:], c0[None].astype(cseq.dtype)],
                                axis=0)
    else:
        hprev = jnp.concatenate([h0[None].astype(y_t.dtype), y_t[:-1]],
                                axis=0)
        cprev = jnp.concatenate([c0[None].astype(cseq.dtype), cseq[:-1]],
                                axis=0)

    dhT = jnp.zeros((B, H), jnp.float32) if dhT is None else dhT
    dcT = jnp.zeros((B, H), jnp.float32) if dcT is None else dcT
    dxp_t, dh0, dc0, dwhh = _bwd_call(
        gates, cseq, cprev, hprev, dy_t,
        dhT.astype(jnp.float32), dcT.astype(jnp.float32), w_hh,
        reverse, b_tile, interpret, dot_dtype)
    return (dxp_t.astype(jnp.result_type(gates.dtype)),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype),
            dwhh.astype(w_hh.dtype))


lstm_scan_train_tm.defvjp(_fwd_rule, _bwd_rule)


def lstm_scan_train(xp, h0, c0, w_hh, reverse: bool = False,
                    b_tile: int = 0, interpret: bool = False,
                    dot_dtype=jnp.float32):
    """Batch-major wrapper: xp [B, T, 4H] -> (y [B, T, H], hT, cT).

    Pays [B,T,*] <-> [T,B,*] transposes on xp/y (and their cotangents);
    prefer lstm_scan_train_tm plus a transpose of the narrower raw x when
    the projection can be hoisted time-major."""
    y_t, hT, cT = lstm_scan_train_tm(
        jnp.swapaxes(xp, 0, 1), h0, c0, w_hh, reverse, b_tile, interpret,
        dot_dtype)
    return jnp.swapaxes(y_t, 0, 1), hT, cT


# ---------------------------------------------------------------------------
# Fused-projection variant (round 4): the input projection xp = x @ w_ih
# and its gradient run INSIDE the kernels, so the [T, B, 4H] xp tensor (and
# dxp in the backward) never touches HBM. At the flagship training shapes
# those are ~275 MB per SkiM block per pass on a step measured HBM-bound —
# the projection matmuls are extra MXU work inside a VPU-bound body, i.e.
# nearly free. x stays BATCH-major ([B, T, C] blocks) so no transpose
# materializes in front of the Pallas operand.
# ---------------------------------------------------------------------------


def _fwd_kernel_fp(nT: int, u: int, reverse: bool, dot_dtype):
    def kernel(x_ref, h0_ref, c0_ref, wih_ref, bias_ref, whh_ref,
               y_ref, hT_ref, cT_ref, gates_ref, cseq_ref,
               h_scr, c_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:].astype(jnp.float32)
            c_scr[:] = c0_ref[:].astype(jnp.float32)

        h = h_scr[:]
        c = c_scr[:]
        H = h.shape[-1]
        bias = bias_ref[:].astype(jnp.float32)  # [1, 4H]
        for kk in range(u):
            k = u - 1 - kk if reverse else kk
            gates = (jnp.dot(x_ref[k].astype(dot_dtype),
                             wih_ref[:].astype(dot_dtype),
                             preferred_element_type=jnp.float32)
                     + bias
                     + jnp.dot(h.astype(dot_dtype),
                               whh_ref[:].astype(dot_dtype),
                               preferred_element_type=jnp.float32))
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            y_ref[k] = h.astype(y_ref.dtype)
            gates_ref[k] = jnp.concatenate([i, f, g, o], axis=-1
                                           ).astype(gates_ref.dtype)
            cseq_ref[k] = c.astype(cseq_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c

        @pl.when(t == nT - 1)
        def _():
            hT_ref[:] = h.astype(hT_ref.dtype)
            cT_ref[:] = c.astype(cT_ref.dtype)

    return kernel


def _bwd_kernel_fp(nT: int, nb: int, u: int, fwd_reverse: bool, dot_dtype):
    """u must be 1 (guaranteed by _pick_u): the previous-step h/c arrive
    as SHIFTED blocks of the forward's own y/cseq outputs (yprev_ref /
    csprev_ref, clamped index maps) with the boundary step selecting the
    resident h0/c0 blocks — the host-side hprev/cprev concats those
    shifted views used to be materialized (~69 MB per block-direction per
    backward at flagship training shapes, round-5)."""

    def kernel(gates_ref, cseq_ref, csprev_ref, yprev_ref, x_ref, dy_ref,
               dhT_ref, dcT_ref, h0_ref, c0_ref, whh_ref, wih_ref,
               dx_ref, dh0_ref, dc0_ref, dwhh_ref, dwih_ref, dbias_ref,
               dh_scr, dc_scr, dw_scr, dwi_scr, db_scr):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dh_scr[:] = dhT_ref[:].astype(jnp.float32)
            dc_scr[:] = dcT_ref[:].astype(jnp.float32)
            dw_scr[:] = jnp.zeros_like(dw_scr)
            dwi_scr[:] = jnp.zeros_like(dwi_scr)
            db_scr[:] = jnp.zeros_like(db_scr)

        H = dh_scr.shape[-1]
        dh_c = dh_scr[:]
        dc_c = dc_scr[:]
        dw = jnp.zeros_like(dw_scr)
        dwi = jnp.zeros_like(dwi_scr)
        db = jnp.zeros_like(db_scr)
        # the boundary grid step processes the forward's FIRST step (its
        # previous state is h0/c0, not a shifted y/cseq block) — with both
        # time walks, that is the LAST grid iteration
        at_h0 = (t == nT - 1)
        for kk in range(u):
            k = kk if fwd_reverse else u - 1 - kk
            gates = gates_ref[k].astype(jnp.float32)
            i = gates[:, :H]
            f = gates[:, H:2 * H]
            g = gates[:, 2 * H:3 * H]
            o = gates[:, 3 * H:]
            c_new = cseq_ref[k].astype(jnp.float32)
            c_prev = jnp.where(at_h0, c0_ref[:].astype(jnp.float32),
                               csprev_ref[k].astype(jnp.float32))
            hprev_k = jnp.where(at_h0, h0_ref[:].astype(jnp.float32),
                                yprev_ref[k].astype(jnp.float32))
            tanh_c = jnp.tanh(c_new)

            dh = dh_c + dy_ref[k].astype(jnp.float32)
            dc = dc_c + dh * o * (1.0 - tanh_c * tanh_c)
            dgo = dh * tanh_c * o * (1.0 - o)
            dgf = dc * c_prev * f * (1.0 - f)
            dgi = dc * g * i * (1.0 - i)
            dgg = dc * i * (1.0 - g * g)
            dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)

            dx_ref[k] = jnp.dot(
                dgates.astype(dot_dtype), wih_ref[:].astype(dot_dtype).T,
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)
            dh_c = jnp.dot(dgates.astype(dot_dtype),
                           whh_ref[:].astype(dot_dtype).T,
                           preferred_element_type=jnp.float32)
            dc_c = dc * f
            dw += jnp.dot(hprev_k.astype(dot_dtype).T,
                          dgates.astype(dot_dtype),
                          preferred_element_type=jnp.float32)
            dwi += jnp.dot(x_ref[k].astype(dot_dtype).T,
                           dgates.astype(dot_dtype),
                           preferred_element_type=jnp.float32)
            db += jnp.sum(dgates, axis=0, keepdims=True)
        dh_scr[:] = dh_c
        dc_scr[:] = dc_c
        dw_scr[:] += dw
        dwi_scr[:] += dwi
        db_scr[:] += db

        @pl.when(t == nT - 1)
        def _():
            dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
            dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)

        @pl.when((t == nT - 1) & (b == 0))
        def _():
            dwhh_ref[:] = dw_scr[:].astype(dwhh_ref.dtype)
            dwih_ref[:] = dwi_scr[:].astype(dwih_ref.dtype)
            dbias_ref[:] = db_scr[:].astype(dbias_ref.dtype)

        @pl.when((t == nT - 1) & (b > 0))
        def _():
            dwhh_ref[:] += dw_scr[:].astype(dwhh_ref.dtype)
            dwih_ref[:] += dwi_scr[:].astype(dwih_ref.dtype)
            dbias_ref[:] += db_scr[:].astype(dbias_ref.dtype)

    return kernel


def _fwd_call_fp(x_t, h0, c0, w_ih, bias, w_hh, reverse, b_tile, interpret,
                 dot_dtype):
    T, B, C = x_t.shape
    H4 = w_ih.shape[1]
    H = H4 // 4
    nb = B // b_tile
    u = _pick_u(T)
    nT = T // u
    tmap = _tmap(reverse, nT)
    bmap = lambda b, t: (b, 0)
    kernel = _fwd_kernel_fp(nT, u, reverse, dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb, nT),
        in_specs=[
            pl.BlockSpec((u, b_tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_ih.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x_t.dtype),
            jax.ShapeDtypeStruct((B, H), h0.dtype),
            jax.ShapeDtypeStruct((B, H), c0.dtype),
            jax.ShapeDtypeStruct((T, B, H4), x_t.dtype),  # activated gates
            jax.ShapeDtypeStruct((T, B, H), x_t.dtype),   # cell states
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, h0, c0, w_ih, bias.reshape(1, -1), w_hh)


def _bwd_call_fp(gates, cseq, y_t, x_t, dy_t, dhT, dcT, h0, c0, w_hh, w_ih,
                 reverse, b_tile, interpret, dot_dtype):
    T, B, H4 = gates.shape
    H = H4 // 4
    C = x_t.shape[-1]
    nb = B // b_tile
    u = _pick_u(T)
    assert u == 1, "no-concat prev-state blocks require u == 1 (_pick_u)"
    nT = T // u
    tmap = _tmap(not reverse, nT)
    bmap = lambda b, t: (b, 0)
    # previous-step h/c as SHIFTED (clamped at the boundary) blocks of the
    # forward's y/cseq; the boundary grid step selects h0/c0 in-kernel
    if reverse:
        pmap = lambda b, t: (jnp.minimum(t + 1, nT - 1), b, 0)
    else:
        pmap = lambda b, t: (jnp.maximum(nT - 2 - t, 0), b, 0)
    kernel = _bwd_kernel_fp(nT, nb, u, reverse, dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb, nT),
        in_specs=[
            pl.BlockSpec((u, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_ih.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u, b_tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_ih.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, C), x_t.dtype),  # dx (time-major)
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((C, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
            pltpu.VMEM((C, H4), jnp.float32),
            pltpu.VMEM((1, H4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gates, cseq, cseq, y_t, x_t, dy_t, dhT, dcT, h0, c0, w_hh, w_ih)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def lstm_scan_train_fp(x, h0, c0, w_ih, bias, w_hh, reverse: bool = False,
                       b_tile: int = 0, interpret: bool = False,
                       dot_dtype=jnp.float32):
    """Differentiable fused LSTM scan with IN-KERNEL input projection.

    x [B, T, C] raw inputs (batch-major — no transpose materializes in
    front of the kernel), w_ih [C, 4H], bias [4H] (= b_ih + b_hh),
    w_hh [H, 4H]. Returns (y [B, T, H], hT, cT).

    vs lstm_scan_train: the hoisted xp = x @ w_ih ([B, T, 4H]) and its
    cotangent dxp never exist in HBM — the forward computes the projection
    per time step on the MXU (the body is VPU-bound on the gate
    transcendentals, so this is nearly free) and the backward emits
    dx / dw_ih / dbias directly from its VMEM-resident dgates.
    """
    y_t, hT, cT, _, _ = _run_fwd_fp(x, h0, c0, w_ih, bias, w_hh, reverse,
                                    b_tile, interpret, dot_dtype)
    return jnp.swapaxes(y_t, 0, 1), hT, cT


def _run_fwd_fp(x, h0, c0, w_ih, bias, w_hh, reverse, b_tile, interpret,
                dot_dtype):
    # kernel-native layout is time-major; the TPU lowering requires the
    # last two block dims (8, 128)-aligned, which a batch-major
    # (b_tile, 1, C) x block violates — transpose the NARROW x instead
    # (4x less traffic than the xp transpose the hoisted path fuses away)
    B, T, C = x.shape
    b_tile = _resolve_tile(B, b_tile)
    return _fwd_call_fp(jnp.swapaxes(x, 0, 1), h0, c0, w_ih, bias, w_hh,
                        reverse, b_tile, interpret, dot_dtype)


def _fwd_rule_fp(x, h0, c0, w_ih, bias, w_hh, reverse, b_tile, interpret,
                 dot_dtype):
    y_t, hT, cT, gates, cseq = _run_fwd_fp(
        x, h0, c0, w_ih, bias, w_hh, reverse, b_tile, interpret, dot_dtype)
    return ((jnp.swapaxes(y_t, 0, 1), hT, cT),
            (gates, cseq, c0, h0, y_t, jnp.swapaxes(x, 0, 1), w_ih, w_hh,
             bias))


def _bwd_rule_fp(reverse, b_tile, interpret, dot_dtype, res, cts):
    gates, cseq, c0, h0, y_t, x_t, w_ih, w_hh, bias = res
    dy, dhT, dcT = cts
    dy_t = jnp.swapaxes(dy, 0, 1)
    T, B, H4 = gates.shape
    H = H4 // 4
    b_tile = _resolve_tile(B, b_tile)

    dhT = jnp.zeros((B, H), jnp.float32) if dhT is None else dhT
    dcT = jnp.zeros((B, H), jnp.float32) if dcT is None else dcT
    dx_t, dh0, dc0, dwhh, dwih, dbias = _bwd_call_fp(
        gates, cseq, y_t, x_t, dy_t,
        dhT.astype(jnp.float32), dcT.astype(jnp.float32), h0, c0, w_hh,
        w_ih, reverse, b_tile, interpret, dot_dtype)
    return (jnp.swapaxes(dx_t, 0, 1), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
            dwih.astype(w_ih.dtype), dbias.reshape(-1).astype(bias.dtype),
            dwhh.astype(w_hh.dtype))


lstm_scan_train_fp.defvjp(_fwd_rule_fp, _bwd_rule_fp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def lstm_scan_train_fp_tm(x_t, h0, c0, w_ih, bias, w_hh,
                          reverse: bool = False, b_tile: int = 0,
                          interpret: bool = False, dot_dtype=jnp.float32):
    """TIME-MAJOR lstm_scan_train_fp: x_t [T, B, C] -> (y_t [T, B, H], hT, cT).

    The kernel-native layout end to end: a caller that keeps its whole
    block stack time-major (nnet/skim.py TM_BLOCKS) pays NO transpose
    materializations around the kernel — the batch-major wrapper's
    swapaxes on x/y/dy/dx were ~4 x 27-69 MB of HBM writes per SkiM
    block per pass (round-5 HLO audit)."""
    T, B, C = x_t.shape
    y_t, hT, cT, _, _ = _fwd_call_fp(x_t, h0, c0, w_ih, bias, w_hh,
                                     reverse, _resolve_tile(B, b_tile),
                                     interpret, dot_dtype)
    return y_t, hT, cT


def _fwd_rule_fp_tm(x_t, h0, c0, w_ih, bias, w_hh, reverse, b_tile,
                    interpret, dot_dtype):
    B = x_t.shape[1]
    y_t, hT, cT, gates, cseq = _fwd_call_fp(
        x_t, h0, c0, w_ih, bias, w_hh, reverse, _resolve_tile(B, b_tile),
        interpret, dot_dtype)
    return ((y_t, hT, cT),
            (gates, cseq, c0, h0, y_t, x_t, w_ih, w_hh, bias))


def _bwd_rule_fp_tm(reverse, b_tile, interpret, dot_dtype, res, cts):
    gates, cseq, c0, h0, y_t, x_t, w_ih, w_hh, bias = res
    dy_t, dhT, dcT = cts
    T, B, H4 = gates.shape
    H = H4 // 4
    b_tile = _resolve_tile(B, b_tile)

    dhT = jnp.zeros((B, H), jnp.float32) if dhT is None else dhT
    dcT = jnp.zeros((B, H), jnp.float32) if dcT is None else dcT
    dx_t, dh0, dc0, dwhh, dwih, dbias = _bwd_call_fp(
        gates, cseq, y_t, x_t, dy_t,
        dhT.astype(jnp.float32), dcT.astype(jnp.float32), h0, c0, w_hh,
        w_ih, reverse, b_tile, interpret, dot_dtype)
    return (dx_t, dh0.astype(h0.dtype), dc0.astype(c0.dtype),
            dwih.astype(w_ih.dtype), dbias.reshape(-1).astype(bias.dtype),
            dwhh.astype(w_hh.dtype))


lstm_scan_train_fp_tm.defvjp(_fwd_rule_fp_tm, _bwd_rule_fp_tm)
