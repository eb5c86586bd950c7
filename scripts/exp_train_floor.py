"""Coarse device-level decomposition of the flagship train step.

The XLA profiler undercounts on the tunneled backend (see
exp_train_dispatch.py), so this splits the step the honest way: separate
jitted programs for (a) forward loss only, (b) forward+backward
(value_and_grad), (c) the full step, each timed with a value-fetch sync.
(c)-(b) ~= optimizer+clip; (b)-(a) ~= backward. Also probes B=128 for a
throughput-per-chip win (B=256 f32 OOMed in round 2; bf16 halves
activation HBM).

Run: python scripts/exp_train_floor.py [B ...]
"""
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import numpy as np  # noqa: E402


def build(B):
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
    step = make_train_step(model, grad_clip=10.0, donate=False,
                           compute_dtype=jnp.bfloat16)
    return model, batch, state, step


def timeit(fn, sync, iters=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    Bs = [int(a) for a in sys.argv[1:]] or [64]
    import jax
    import jax.numpy as jnp

    for B in Bs:
        model, batch, state, step = build(B)
        key = jax.random.PRNGKey(1)

        def cast(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                tree)

        def loss_fn(params, batch, rng):
            out = model.apply({"params": cast(params)}, **cast(batch),
                              train=True, mutable=["batch_stats"],
                              rngs={"dropout": rng})[0]
            loss = out[0] if isinstance(out, tuple) else out
            return loss.astype(jnp.float32)

        fwd = jax.jit(loss_fn)
        vag = jax.jit(jax.grad(loss_fn))

        res = {"B": B}
        try:
            res["fwd_ms"] = round(timeit(
                lambda: fwd(state.params, batch, key),
                lambda o: float(np.asarray(o))), 2)
            res["fwd_bwd_ms"] = round(timeit(
                lambda: vag(state.params, batch, key),
                lambda o: float(np.asarray(
                    jax.tree_util.tree_leaves(o)[0].ravel()[0]))), 2)
            res["step_ms"] = round(timeit(
                lambda: step(state, batch, key),
                lambda o: float(np.asarray(o[1]["loss"]))), 2)
            res["audio_s_per_s"] = round(B * 2.0 * 1000.0 / res["step_ms"], 1)
        except Exception as e:
            res["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(res, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
