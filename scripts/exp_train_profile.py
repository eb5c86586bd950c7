"""Profile the flagship B=64 bf16 training step: where do 48 ms go?

Tries an XLA profiler trace (per-op self-times); if the tunneled backend
does not support tracing, falls back to coarse jitted-part timings
(forward / forward+backward / full step).

Run: python scripts/exp_train_profile.py [B]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import numpy as np  # noqa: E402


def top_ops_from_trace(log_dir, n=40):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    acc = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep device lanes only (TensorCore ops), skip python/host rows
        name = ev.get("name", "")
        acc[name] = acc.get(name, 0.0) + ev["dur"]
    return sorted(acc.items(), key=lambda kv: -kv[1])[:n]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax

    ms, aud, roof = bench.measure_train(mixed=True, B=B)
    print({"step_ms": round(ms, 2), "audio_s_per_s": round(aud, 1),
           "roofline": roof}, flush=True)

    # rebuild the step for tracing (measure_train doesn't return it)
    import jax.numpy as jnp
    import optax

    from puresound_tpu.nnet import conv_tasnet as _ct
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.lobe import rnn as _rnn
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.parallel import TrainState, make_train_step
    from puresound_tpu.zoo import init_tse_model

    _rnn.FUSED_TRAIN_SCAN = True
    _ct.FUSED_TCN = True
    model = init_tse_model("tse_skim_v0_causal",
                           sig_loss=SDRLoss.init_mode("sisnr"))
    L = int(16000 * 2.0)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)
                            * 0.1)
             for k in ("noisy", "enroll", "ref_clean")}
    variables = model.init(jax.random.PRNGKey(0), batch["noisy"],
                           batch["enroll"], method=SoTaskWrapModule.inference)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adam(1e-3))
    step = make_train_step(model, grad_clip=10.0,
                           compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    s, m = step(state, batch, key)
    float(np.asarray(m["loss"]))

    log_dir = "/tmp/train_trace"
    try:
        jax.profiler.start_trace(log_dir)
        for _ in range(3):
            s, m = step(s, batch, key)
        float(np.asarray(m["loss"]))
        jax.profiler.stop_trace()
        top = top_ops_from_trace(log_dir)
    except Exception as e:
        print({"trace": f"failed: {type(e).__name__}: {str(e)[:120]}"},
              flush=True)
        top = None
    if top:
        tot = sum(d for _, d in top)
        print(f"# top ops (us over 3 steps; top-40 total {tot:.0f})",
              flush=True)
        for name, dur in top:
            print(f"{dur/3:10.0f} us  {name[:110]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
