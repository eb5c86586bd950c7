"""Pallas TPU kernel: full-width LSTM recurrence scan.

The serial bottleneck of every recurrent scan here (DPCRN/DPARN intra
frequency-BiLSTM, inter time-LSTM) is the per-step recurrence
`gates = xp[t] + h @ w_hh` — the input projection is hoisted outside as
one large MXU matmul, but XLA's `lax.scan` still round-trips the carry and
the [B, 4H] gate intermediates through HBM every step and pays per-step
while-loop overhead.

This kernel runs the recurrence with the carry resident in VMEM, gridded
over (batch tiles, time): the batch dimension stays FULL WIDTH inside each
step's matmul (unlike a streams-tiled design, the MXU sees [b_tile, H] x
[H, 4H] with b_tile in the hundreds-to-thousands), and each step's xp
slice is streamed in by the Pallas pipeline while the previous step
computes.

Gate order matches torch / LSTMCellParams (i, f, g, o) so weights plug in
unchanged (reference puresound/nnet/lobe/rnn.py:9-53 semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_b_tile(rows: int, cap: int = 1024) -> int:
    """Largest divisor of `rows` that keeps a [b_tile, 4H] step slice (and
    its pipeline prefetch) comfortably inside VMEM. Empirically the TPU
    compiler rejects b_tile=2048 once rows >= 64k, so 1024 is the ceiling."""
    bt = min(rows, cap)
    while rows % bt:
        bt -= 1
    return bt


def _make_kernel(T: int, dot_dtype):
    def kernel(xp_ref, h0_ref, c0_ref, whh_ref, y_ref, hT_ref, cT_ref,
               h_scr, c_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:].astype(jnp.float32)
            c_scr[:] = c0_ref[:].astype(jnp.float32)

        h = h_scr[:]  # carry always f32 (bf16 inputs still get f32 state)
        c = c_scr[:]
        gates = (xp_ref[0].astype(jnp.float32)
                 + jnp.dot(h.astype(dot_dtype),
                           whh_ref[:].astype(dot_dtype),
                           preferred_element_type=jnp.float32))
        H = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_scr[:] = h_new
        c_scr[:] = c_new
        y_ref[0] = h_new.astype(y_ref.dtype)

        @pl.when(t == T - 1)
        def _():
            hT_ref[:] = h_new.astype(hT_ref.dtype)
            cT_ref[:] = c_new.astype(cT_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("reverse", "b_tile",
                                             "interpret", "dot_dtype"))
def lstm_scan(xp, h0, c0, w_hh, reverse: bool = False, b_tile: int = 0,
              interpret: bool = False, dot_dtype=jnp.float32):
    """Run an LSTM recurrence over pre-projected inputs.

    Args:
        xp: [B, T, 4H] hoisted input projections (x @ w_ih + b_ih + b_hh,
            gate order i,f,g,o).
        h0/c0: [B, H] initial carry.
        w_hh: [H, 4H] recurrent weights.
        reverse: scan T backwards (y stays input-aligned, like
            LSTMCellParams.scan(reverse=True)).
        b_tile: batch tile (0 = whole batch in one tile).

    Returns: (y [B, T, H], hT [B, H], cT [B, H]) — identical numerics to
    LSTMCellParams.scan.
    """
    B, T, H4 = xp.shape
    H = H4 // 4
    if b_tile <= 0 or b_tile > B:
        b_tile = B
    assert B % b_tile == 0, f"batch {B} must tile by {b_tile}"
    nb = B // b_tile

    xp_t = jnp.swapaxes(xp, 0, 1)  # [T, B, 4H] — time-major slices

    if reverse:
        tmap = lambda b, t: (T - 1 - t, b, 0)
    else:
        tmap = lambda b, t: (t, b, 0)

    kernel = _make_kernel(T, dot_dtype)
    grid = (nb, T)
    y, hT, cT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b_tile, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_hh.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
            jax.ShapeDtypeStruct((B, H), h0.dtype),
            jax.ShapeDtypeStruct((B, H), c0.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp_t, h0, c0, w_hh)
    return jnp.swapaxes(y, 0, 1), hT, cT
