"""Per-pass HBM/time audit of the flagship train step (round 5, VERDICT
item 3): B=64 bf16 fused — where do 25.8 GB/step and 41.6 ms go?

Measures (value-fetch synced) and cost-analyzes:
  loss-only            (forward)
  grad                 (forward + backward, no clip/update)
  full step            (forward + backward + clip + adam)

Run on the TPU: python scripts/exp_train_audit.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp
import optax

from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.loss.sdr import SDRLoss
from puresound_tpu.parallel import TrainState, make_train_step
from puresound_tpu.utils.roofline import xla_cost
from puresound_tpu.zoo import init_tse_model
from puresound_tpu.nnet import conv_tasnet as _ct
from puresound_tpu.nnet.lobe import rnn as _rnn

_rnn.FUSED_TRAIN_SCAN = True
_ct.FUSED_TCN = True

B, L = 64, 32000
model = init_tse_model("tse_skim_v0_causal", sig_loss=SDRLoss.init_mode("sisnr"))
rng = np.random.default_rng(0)
batch = {k: jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
         for k in ("noisy", "enroll", "ref_clean")}
variables = model.init(jax.random.PRNGKey(0), batch["noisy"], batch["enroll"],
                       method=SoTaskWrapModule.inference)
state = TrainState.create(variables["params"],
                          variables.get("batch_stats", {}), optax.adam(1e-3))
key = jax.random.PRNGKey(1)

CD = jnp.bfloat16


def cast(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(CD)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


def loss_fn(params, batch, key):
    p = cast(params)
    b = cast(batch)
    out, _upd = model.apply({"params": p}, **b, train=True,
                            mutable=["batch_stats"], rngs={"dropout": key})
    loss = out[0] if isinstance(out, tuple) else out
    return loss.astype(jnp.float32)


@jax.jit
def loss_only(params, batch, key):
    return loss_fn(params, batch, key)


@jax.jit
def grad_only(params, batch, key):
    l, g = jax.value_and_grad(loss_fn)(params, batch, key)
    return l, g


step = make_train_step(model, grad_clip=10.0, compute_dtype=CD)


def timeit(fn, args, iters=10, fetch=lambda o: o):
    out = fn(*args)
    float(np.asarray(fetch(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(fetch(out)))
    return (time.perf_counter() - t0) / iters * 1000.0


def report(name, lowered_compiled, ms):
    c = xla_cost(lowered_compiled)
    print(f"{name:12s} {ms:8.2f} ms  {c['bytes']/1e9:7.2f} GB  "
          f"{c['flops']/1e9:8.1f} Gflop  -> {c['bytes']/1e9/(ms/1e3):6.1f} GB/s",
          flush=True)
    return c


print("platform:", jax.devices()[0].platform, flush=True)

lc = loss_only.lower(state.params, batch, key).compile()
ms_l = timeit(loss_only, (state.params, batch, key))
report("loss-only", lc, ms_l)

gc_ = grad_only.lower(state.params, batch, key).compile()
ms_g = timeit(grad_only, (state.params, batch, key), fetch=lambda o: o[0])
report("grad", gc_, ms_g)

sc = step.lower(state, batch, key).compile()
# step donates state: rebuild each call chainless by reusing output state
s, m = step(state, batch, key)
float(np.asarray(m["loss"]))
t0 = time.perf_counter()
iters = 10
for _ in range(iters):
    s, m = step(s, batch, key)
float(np.asarray(m["loss"]))
ms_s = (time.perf_counter() - t0) / iters * 1000.0
report("full-step", sc, ms_s)

print(f"\ndeltas: bwd = {ms_g - ms_l:.2f} ms, clip+adam = {ms_s - ms_g:.2f} ms")
