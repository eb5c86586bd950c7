"""Micro-probe: LSTM gate transcendental cost inside a serial Pallas scan.

The train-step floor analysis (docs/BENCHMARKS.md) leaves one lever:
the fused LSTM kernels are VPU-bound on the gate nonlinearities
(3 sigmoid + 2 tanh over [b_tile, H] per serial step; u-step batching
measured neutral because the transcendental time dominates the grid
overhead). This probe measures a bare serial scan with three gate-math
variants at train-kernel-like shapes:

  stock    jax.nn.sigmoid / jnp.tanh (current kernels)
  exp2     sigmoid(x) = recip_approx(1 + 2^(-x*log2e)); tanh via
           2*sigmoid(2x)-1 (pl.reciprocal(approx=True) + native pow2)
  exp2div  same exp2 form but exact IEEE divide (isolates the
           approx-reciprocal contribution)

Also reports on-device SNR of each fast variant vs stock over a full
scan (the hardware approx-reciprocal error is invisible in interpret
mode, so accuracy must be measured on the real chip).

RESULT (2026-08-19, T=150 bt=512 H=256): stock 8.02 us/step,
exp2+approx-recip 10.99 (SLOWER — the extra mul/recip ops outweigh any
transcendental saving), exp2+exact-div 8.03 (exact tie). The TPU's
native sigmoid/tanh lowering is already optimal; gate math is NOT a
lever for the LSTM kernels. SNR of the fast forms ~64 dB (approx-recip
error would also be marginal for serving, but there's no win to buy).

Run: python scripts/exp_fast_gates.py [T] [b_tile] [H]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LOG2E = 1.4426950408889634


def _gates(mode, gates, H):
    if mode == "stock":
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        return i, f, g, o, jnp.tanh

    if mode == "exp2":
        def sig(x):
            return pl.reciprocal(1.0 + jnp.exp2(-LOG2E * x), approx=True)
    else:  # exp2div
        def sig(x):
            return 1.0 / (1.0 + jnp.exp2(-LOG2E * x))

    def tanh(x):
        return 2.0 * sig(2.0 * x) - 1.0

    i = sig(gates[:, :H])
    f = sig(gates[:, H:2 * H])
    g = tanh(gates[:, 2 * H:3 * H])
    o = sig(gates[:, 3 * H:])
    return i, f, g, o, tanh


def make_kernel(mode):
    def kernel(xp_ref, whh_ref, y_ref, h_scr, c_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        h = h_scr[:]
        c = c_scr[:]
        H = h.shape[-1]
        gates = (xp_ref[0].astype(jnp.float32)
                 + jnp.dot(h.astype(jnp.bfloat16),
                           whh_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32))
        i, f, g, o, tanh = _gates(mode, gates, H)
        c = f * c + i * g
        h = o * tanh(c)
        y_ref[0] = h.astype(y_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c

    return kernel


def run_scan(mode, xp, whh, bt):
    T, B, H4 = xp.shape
    H = H4 // 4
    return pl.pallas_call(
        make_kernel(mode),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, bt, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(whh.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32),
                        pltpu.VMEM((bt, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, whh)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    bt = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((T, bt, 4 * H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    whh = jnp.asarray(0.05 * rng.standard_normal((H, 4 * H))
                      .astype(np.float32)).astype(jnp.bfloat16)

    outs = {}
    for mode in ("stock", "exp2", "exp2div"):
        run = jax.jit(functools.partial(run_scan, mode, bt=bt))
        try:
            y = run(xp, whh)
            float(jnp.sum(y.astype(jnp.float32)))  # true-completion sync
            n, t0 = 30, time.perf_counter()
            for _ in range(n):
                y = run(xp, whh)
            float(jnp.sum(y.astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / n * 1000
            outs[mode] = np.asarray(y.astype(jnp.float32))
            print({"mode": mode, "T": T, "bt": bt, "H": H,
                   "ms": round(ms, 3),
                   "us_per_step": round(ms * 1000 / T, 2)}, flush=True)
        except Exception as e:
            print({"mode": mode,
                   "err": f"{type(e).__name__}: {str(e)[:120]}"}, flush=True)

    if "stock" in outs:
        ref = outs["stock"]
        for mode in ("exp2", "exp2div"):
            if mode in outs:
                err = outs[mode] - ref
                snr = 10 * np.log10(
                    (ref ** 2).mean() / max((err ** 2).mean(), 1e-30))
                print({"mode": mode, "snr_vs_stock_db": round(float(snr), 1)},
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
