"""TSE fused-kernel dtype x b_tile sweep at the capacity frontier.

Round-3 found int8_hh beat bf16 at b_tile=256 (MXU-rate edge) but LOST at
b_tile=1024 (18.1 vs 16.4 ms @ B=32,768) — the intermediate tiles were
never probed. If int8_hh at 512 lands under 15 ms at 32,768, streaming
capacity rises ~14% over the 28,672 bf16 record.

Run from anywhere: python scripts/exp_tse_int8_tiles.py  (TPU, several
fresh compiles at 2-4 min each on the tunneled backend).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from puresound_tpu.streaming.engine import StreamingTSE

    bench._enable_compile_cache()
    engine = bench.build_engine()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32))
    e0 = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    variables = engine.init(jax.random.PRNGKey(0), x0, e0,
                            method=StreamingTSE.init_all)
    chunk_samples = 240  # 15 ms

    B = 32768
    cases = [
        ("bf16  b_tile=1024", dict(dtype=jnp.bfloat16, b_tile=1024)),
        ("int8h b_tile=512", dict(dtype=jnp.bfloat16, b_tile=512,
                                  int8_hh=True)),
        ("int8h b_tile=2048", dict(dtype=jnp.bfloat16, b_tile=2048,
                                   int8_hh=True)),  # bf16's 2048 failed
        # the remote compile; int8 halves VMEM again, may fit
        ("bf16  b_tile=512", dict(dtype=jnp.bfloat16, b_tile=512)),
    ]
    for name, kw in cases:
        try:
            ms, _, _ = bench.measure_tse_step_ms(
                engine, variables, B, chunk_samples, fused=True, **kw)
            rt = "REAL-TIME" if ms < 15.0 else "over"
            print(f"B={B} {name}: {ms:.2f} ms ({rt})")
        except Exception as e:
            print(f"B={B} {name}: failed {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
