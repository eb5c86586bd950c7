"""Measure the trainer-loop metric-fetch policy on the real TPU.

Round-3h question: the recipe trainers used to call float(metrics["loss"])
immediately after each train-step dispatch — blocking the host on the
in-flight step (and paying the tunneled backend's readback RTT per step).
tasks/base.DeferredMetricSink fetches step k-1 after dispatching step k.
This script measures both policies on the flagship train step with
synthetic device-resident batches (isolates the fetch policy from host
data loading — bench.measure_train_sustained covers the combined effect).

Run: python scripts/exp_pipelined_fetch.py  (TPU; ~2 min incl. compile)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.loss.sdr import SDRLoss
from puresound_tpu.parallel import TrainState, make_train_step
from puresound_tpu.zoo import init_tse_model


def main(B=8, seconds=2.0, n_steps=40):
    model = init_tse_model("tse_skim_v0_causal",
                           sig_loss=SDRLoss.init_mode("sisnr"))
    L = int(16000 * seconds)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((B, L), jnp.float32)
    variables = model.init(key, z, z, method=SoTaskWrapModule.inference)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adam(1e-3))
    step = make_train_step(model, grad_clip=10.0, compute_dtype=jnp.bfloat16)
    ks = jax.random.split(key, 3)
    kw = {"noisy": jax.random.normal(ks[0], (B, L)) * 0.1,
          "enroll": jax.random.normal(ks[1], (B, L)) * 0.1,
          "ref_clean": jax.random.normal(ks[2], (B, L)) * 0.1}

    s, m = step(state, kw, key)  # compile
    float(np.asarray(m["loss"]))

    # policy A: sync every step (the old loop)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s, m = step(s, kw, key)
        float(np.asarray(m["loss"]))
    t_sync = (time.perf_counter() - t0) / n_steps * 1000.0

    # policy B: deferred fetch (DeferredMetricSink semantics)
    pending = None
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s, m = step(s, kw, key)
        if pending is not None:
            float(np.asarray(pending["loss"]))
        pending = m
    float(np.asarray(pending["loss"]))
    t_pipe = (time.perf_counter() - t0) / n_steps * 1000.0

    print(f"B={B} x {seconds}s, {n_steps} steps, "
          f"backend={jax.devices()[0].platform}")
    print(f"per-step sync : {t_sync:.2f} ms/step")
    print(f"deferred fetch: {t_pipe:.2f} ms/step "
          f"({t_sync / t_pipe:.2f}x)")


if __name__ == "__main__":
    main()
