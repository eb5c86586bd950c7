"""A/B the fused-projection LSTM train kernel on the flagship TPU step.

Round-4 verdict item 2: close the B=64 bf16 train step (measured 47.3 ms)
toward the ~36 ms HBM floor. lstm_scan_train_fp keeps xp/dxp ([B, T, 4H],
~275 MB per SkiM block per pass) out of HBM entirely.

Run ON TPU (no override): python scripts/exp_train_fused_proj.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import optax

    import puresound_tpu.nnet.lobe.rnn as rnn_mod
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.parallel import TrainState, make_train_step
    from puresound_tpu.zoo import init_tse_model

    rnn_mod.FUSED_TRAIN_SCAN = True
    B, sec = int(os.environ.get("B", 64)), 2.0
    L = int(16000 * sec)
    model = init_tse_model("tse_skim_v0_causal",
                           sig_loss=SDRLoss.init_mode("sisnr"))
    rng = np.random.default_rng(0)
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["noisy"],
                           batch["enroll"],
                           method=SoTaskWrapModule.inference)

    def measure(fused_proj, iters=12):
        rnn_mod.FUSED_PROJ_SCAN = fused_proj
        state = TrainState.create(variables["params"], {}, optax.adam(1e-3))
        # fresh lambda per config: jit caches on the function object and
        # module globals are not part of the trace key (CLAUDE.md gotcha)
        base = make_train_step(model, grad_clip=10.0, donate=False,
                               compute_dtype=jnp.bfloat16)
        step = jax.jit(lambda s, b, r: base(s, b, r))
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        state, m = step(state, batch, key)
        loss0 = float(m["loss"])  # value-sync (block_until_ready lies here)
        compile_s = time.time() - t0
        t0 = time.time()
        for k in range(iters):
            state, m = step(state, batch, key)
        loss = float(m["loss"])
        dt = (time.time() - t0) / iters * 1000
        return dt, compile_s, loss0, loss

    ms_off, c_off, l0_off, l_off = measure(False)
    print(f"fused_proj=OFF: {ms_off:.2f} ms/step (compile {c_off:.0f}s, "
          f"loss {l0_off:.4f} -> {l_off:.4f})", flush=True)
    ms_on, c_on, l0_on, l_on = measure(True)
    print(f"fused_proj=ON : {ms_on:.2f} ms/step (compile {c_on:.0f}s, "
          f"loss {l0_on:.4f} -> {l_on:.4f})", flush=True)
    print(f"speedup: {ms_off / ms_on:.3f}x; loss delta first-step "
          f"{abs(l0_on - l0_off):.2e}")


if __name__ == "__main__":
    main()
