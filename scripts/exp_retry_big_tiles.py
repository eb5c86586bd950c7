"""Retry the previously-uncompilable big-tile configs (HTTP-500 class).

Round-3 recorded tile ceilings as remote-compile failures while the
compile service was degraded/flaky; with a healthy service those may
have been transient. Each retry runs in a subprocess with a hard timeout
so a compile hang can't stall the session.

Run ON TPU: python scripts/exp_retry_big_tiles.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TSE_CODE = """
import bench, jax, jax.numpy as jnp, numpy as np
bench._enable_compile_cache()
from puresound_tpu.streaming.engine import StreamingTSE
engine = bench.build_engine()
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32))
e0 = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
variables = engine.init(jax.random.PRNGKey(0), x0, e0,
                        method=StreamingTSE.init_all)
ms, _, _ = bench.measure_tse_step_ms(engine, variables, 28672, 240,
                                     fused=True, dtype=jnp.bfloat16,
                                     b_tile=2048)
print("RESULT tse b_tile=2048 @28672:", round(ms, 3), "ms")
"""


def run(name, args, env=None, timeout=1500):
    try:
        r = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout,
                           env={**os.environ, **(env or {})})
        out = (r.stdout or "").strip().splitlines()
        keep = [l for l in out if l.startswith(("RESULT", "{"))]
        print(f"{name}: rc={r.returncode} " + " | ".join(keep[-3:])
              if keep else f"{name}: rc={r.returncode} "
              + (r.stderr or "").strip().splitlines()[-1][:160], flush=True)
    except subprocess.TimeoutExpired:
        print(f"{name}: TIMEOUT (compile hang class)", flush=True)


def main():
    run("tse_b2048", [sys.executable, "-c", TSE_CODE])
    run("dp_b256", [sys.executable, "scripts/exp_dp_btile.py", "3584"],
        env={"TILES": "256,128"})


if __name__ == "__main__":
    main()
