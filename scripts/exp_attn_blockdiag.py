"""Probe: per-head vs block-diagonal attention in the DPARN intra kernel.

The fused intra pass runs at ~2.5% MFU: with H=8 heads of Dh=16 at C=128,
each head's attention dots are [F=64, 16] x [16, 64] batched over rows —
1/8 lane utilization per MXU pass and 2*H batched dots per layer. The
blockdiag variant computes ALL heads in 2 full-width batched dots via
static block-diagonal masks (see ops/dparn_attention_kernel.py).

Reports time per call at flagship DPARN geometry for both variants plus
on-device SNR of blockdiag vs perhead (f32 dots).

RESULT (2026-08-19, R=4096): blockdiag FAILS the remote TPU compile
(tpu_compile_helper HTTP 500) at f32/bf16 x r_tile 32/64, while exact in
interpret mode. perhead: f32 rt32 8.73 ms, bf16 rt32 8.42, bf16 rt64
7.51 ms. The 500 class tracks kernel-body complexity on this toolchain
(see CLAUDE.md); the masked-concat form adds too much. perhead stays.

Run: python scripts/exp_attn_blockdiag.py [R ...]
"""
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from puresound_tpu.ops.dparn_attention_kernel import (  # noqa: E402
    dparn_intra_pass)

F, C, H, FFD = 64, 128, 8, 128


def make_weights(rng):
    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * (1.0 / np.sqrt(shape[0])))

    ws = []
    for _ in range(2):  # two encoder layers
        ws += [a(C, C), a(C, C), a(C, C), a(C, C),          # wq/wk/wv/wo ^T
               jnp.ones((C,)), jnp.zeros((C,)),             # ln1
               a(C, FFD), jnp.zeros((FFD,)),                # ff1
               a(FFD, C), jnp.zeros((C,)),                  # ff2
               jnp.ones((C,)), jnp.zeros((C,))]             # ln2
    ws += [a(C, C), jnp.zeros((C,)), jnp.ones((C,)), jnp.zeros((C,))]
    return tuple(ws)


def main():
    rows = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    rng = np.random.default_rng(0)
    weights = make_weights(rng)
    pe = jnp.asarray(rng.standard_normal((F, C)).astype(np.float32) * 0.1)

    for R in rows:
        x = jnp.asarray(rng.standard_normal((R, F, C)).astype(np.float32)
                        * 0.3)
        outs = {}
        import os
        variants = tuple((os.environ.get("VARIANTS") or "perhead,blockdiag").split(","))
        for variant in variants:
            for dd, rt in ((jnp.float32, 32), (jnp.bfloat16, 32),
                           (jnp.bfloat16, 64)):
                key = (variant, dd.__name__, rt)
                xx = x.astype(dd) if dd == jnp.bfloat16 else x
                try:
                    run = jax.jit(lambda x, _v=variant, _d=dd, _rt=rt:
                                  dparn_intra_pass(x, pe.astype(x.dtype),
                                                   tuple(w.astype(x.dtype)
                                                         for w in weights),
                                                   heads=H, r_tile=_rt,
                                                   dot_dtype=_d, variant=_v))
                    y = run(xx)
                    float(jnp.sum(y.astype(jnp.float32)))
                    n, t0 = 30, time.perf_counter()
                    for _ in range(n):
                        y = run(xx)
                    float(jnp.sum(y.astype(jnp.float32)))
                    ms = (time.perf_counter() - t0) / n * 1000
                    if dd == jnp.float32:
                        outs[variant] = np.asarray(y, np.float32)
                    print({"R": R, "variant": variant, "dot": dd.__name__,
                           "r_tile": rt, "ms": round(ms, 3)}, flush=True)
                except Exception as e:
                    print({"R": R, "variant": variant, "dot": dd.__name__,
                           "r_tile": rt,
                           "err": f"{type(e).__name__}: {str(e)[:120]}"},
                          flush=True)
        if "perhead" in outs:
            for v, new in outs.items():
                if v == "perhead":
                    continue
                ref = outs["perhead"]
                err = new - ref
                snr = 10 * np.log10((ref ** 2).mean()
                                    / max((err ** 2).mean(), 1e-30))
                print({"R": R, f"snr_{v}_vs_perhead_db":
                       round(float(snr), 1)}, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
