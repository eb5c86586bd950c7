"""Per-segment HBM/time audit of the flagship B=64 bf16 train step.

Round-4 verdict item 2: either get the step under 40 ms or produce a
traffic audit proving the rest is irreducible. Measures (value-synced)
the forward-only loss, forward+backward, and the full optimizer step,
each with XLA cost-analysis bytes, so the gap to the bandwidth floor is
attributed per segment.

Run ON TPU: python scripts/exp_train_audit.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import puresound_tpu.nnet.lobe.rnn as rnn_mod  # noqa: E402
from puresound_tpu.nnet import conv_tasnet as _ct  # noqa: E402
from puresound_tpu.nnet.base_nn import SoTaskWrapModule  # noqa: E402
from puresound_tpu.nnet.loss.sdr import SDRLoss  # noqa: E402
from puresound_tpu.parallel import TrainState, make_train_step  # noqa: E402
from puresound_tpu.utils.roofline import xla_cost  # noqa: E402
from puresound_tpu.zoo import init_tse_model  # noqa: E402

V5E_HBM_GBPS = 819.0


def _timed(fn, args, iters=15):
    out = fn(*args)
    loss = out[0] if isinstance(out, tuple) else out
    float(np.asarray(jax.tree_util.tree_leaves(loss)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    loss = out[0] if isinstance(out, tuple) else out
    float(np.asarray(jax.tree_util.tree_leaves(loss)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rnn_mod.FUSED_TRAIN_SCAN = True
    _ct.FUSED_TCN = True
    B, L = 64, 32000
    model = init_tse_model("tse_skim_v0_causal",
                           sig_loss=SDRLoss.init_mode("sisnr"))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)
                            * 0.1)
             for k in ("noisy", "enroll", "ref_clean")}
    variables = model.init(jax.random.PRNGKey(0), batch["noisy"],
                           batch["enroll"],
                           method=SoTaskWrapModule.inference)
    params32 = variables["params"]
    stats = variables.get("batch_stats", {})
    key = jax.random.PRNGKey(1)

    def cast16(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": cast16(stats)},
                             **cast16(batch), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        l = out[0] if isinstance(out, tuple) else out
        return l.astype(jnp.float32)

    def fwd_only(p32):
        return loss_fn(cast16(p32))

    def fwd_bwd(p32):
        l, g = jax.value_and_grad(lambda p: loss_fn(cast16(p)))(p32)
        return l, g

    state = TrainState.create(params32, stats, optax.adam(1e-3))
    full = make_train_step(model, grad_clip=10.0, donate=False,
                           compute_dtype=jnp.bfloat16)

    jf = jax.jit(fwd_only)
    jfb = jax.jit(fwd_bwd)
    cost_f = xla_cost(jf.lower(params32).compile())
    cost_fb = xla_cost(jfb.lower(params32).compile())
    cost_full = xla_cost(full.lower(state, batch, key).compile())

    ms_f = _timed(jf, (params32,))
    ms_fb = _timed(jfb, (params32,))

    def full_call(s, b, r):
        return full(s, b, r)

    out = full(state, batch, key)
    float(np.asarray(out[1]["loss"]))
    t0 = time.perf_counter()
    s = state
    for _ in range(15):
        s2, m = full(s, batch, key)
        s = s2
    float(np.asarray(m["loss"]))
    ms_full = (time.perf_counter() - t0) / 15 * 1000.0

    def row(name, ms, cost):
        gb = cost["bytes"] / 1e9
        floor = gb / V5E_HBM_GBPS * 1000.0
        print(f"{name:10s} {ms:7.2f} ms | {gb:6.2f} GB | bw-floor "
              f"{floor:6.2f} ms | hbm-util {gb/ms*1000/V5E_HBM_GBPS*100:5.1f}%")

    print(f"flagship B={B} x 2 s, bf16 mixed, fused scan+proj+tcn")
    row("fwd", ms_f, cost_f)
    row("fwd+bwd", ms_fb, cost_fb)
    row("full step", ms_full, cost_full)
    print(f"bwd-only ~ {ms_fb - ms_f:.2f} ms | opt+glue ~ "
          f"{ms_full - ms_fb:.2f} ms")


if __name__ == "__main__":
    main()
