"""Dump the biggest buffers/ops of the compiled flagship train step
(B=64 bf16) — hunting f32 residual leaks on non-kernel backward paths.

Run on TPU: python scripts/exp_train_hlo.py
"""
import os
import re
import sys
from collections import Counter

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
step = make_train_step(model, grad_clip=10.0, compute_dtype=jnp.bfloat16)
key = jax.random.PRNGKey(1)
comp = step.lower(state, batch, key).compile()
ma = comp.memory_analysis()
print("temp:", round(ma.temp_size_in_bytes / 1e6, 1), "MB",
      " args:", round(ma.argument_size_in_bytes / 1e6, 1), "MB",
      " out:", round(ma.output_size_in_bytes / 1e6, 1), "MB")

txt = comp.as_text()
DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "pred": 1,
      "u8": 1, "f64": 8, "s64": 8, "u64": 8, "f16": 2, "c64": 8}
pat = re.compile(r"\b(f32|bf16|f16|s32|u32|s8|u8|s64|u64|f64|c64|pred)\[([0-9,]*)\]")
op_bytes = Counter()
for line in txt.splitlines():
    ls = line.strip()
    m2 = pat.search(ls)
    if not m2 or "=" not in ls:
        continue
    # first shape on the line = the op's output
    dt, dims = m2.group(1), m2.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    size = n * DT[dt]
    if size < 8e6:
        continue
    rhs = ls.split("=", 1)[1].strip()
    if not rhs:
        continue
    op = rhs.split("(")[0].split()
    op = op[0] if op else "?"
    key2 = f"{op:24s} {dt}[{dims}]"
    op_bytes[key2] += size

print("\nbiggest op outputs (>=8 MB), aggregated by op+shape:")
for k, v in op_bytes.most_common(40):
    print(f"  {v/1e6:9.1f} MB  {k}")
