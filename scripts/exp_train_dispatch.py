"""Is the train-step bench dispatch-bound over the TPU tunnel?

Profiler traces (scripts/exp_train_profile.py) show jit_step_fn device
time ~15.3 ms/step while the wall-clock per-step loop measures ~48 ms —
suggesting ~32 ms/step of tunnel dispatch gap that never pipelines.
This measures both in one process:
  (a) the existing per-step Python loop (bench.measure_train style)
  (b) K train steps chained in ONE jitted lax.scan (one dispatch per K)
If (b) ~= the traced device time, the loop is dispatch-bound and the
device-throughput number belongs in bench.

Run: python scripts/exp_train_dispatch.py [B] [K]
"""
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
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

    # (a) per-step loop
    s, m = step(state, batch, key)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        s, m = step(s, batch, key)
    float(np.asarray(m["loss"]))
    loop_ms = (time.perf_counter() - t0) / iters * 1000.0
    print({"loop_ms_per_step": round(loop_ms, 2)}, flush=True)

    # (b) K steps in one dispatch: scan over K stacked batches
    batches = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in
               batch.items()}

    @jax.jit
    def multi(st, bs, k):
        def body(carry, xs):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step(st, xs, sub)
            return (st, k), m["loss"]
        (st, _), losses = jax.lax.scan(body, (st, k), bs)
        return st, losses

    # `state` was donated into the warm-up step — use the live chain `s`
    s2, losses = multi(s, batches, key)
    float(np.asarray(losses[-1]))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        s2, losses = multi(s2, batches, key)
    float(np.asarray(losses[-1]))
    scan_ms = (time.perf_counter() - t0) / (reps * K) * 1000.0
    print({"scan_ms_per_step": round(scan_ms, 2), "K": K,
           "audio_s_per_s_device": round(B * 2.0 * 1000.0 / scan_ms, 1),
           "dispatch_gap_ms": round(loop_ms - scan_ms, 2)}, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
