"""Bare dual-path-kernel probe: step time vs b_tile at fixed B.

If the kernel is per-iteration latency bound, halving b_tile (2x grid
programs => 2x serial scan iterations) should ~2x the time; if it is
VPU/MXU rate bound, time should be ~flat. Settles whether a sub-tile
interleave (uncompilable on this toolchain so far) would actually pay.

Run: python scripts/exp_dp_btile.py [B]
"""
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from puresound_tpu.ops.dual_path_kernel import (  # noqa: E402
    dual_path_chunk, init_carries)

F, K, CH, H = 64, 2, 128, 128
N_BLOCKS = 2


def make_weights(rng):
    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.05).astype(jnp.bfloat16)

    ws = []
    for _ in range(N_BLOCKS):
        ws += [a(CH, 4 * H), a(H, 4 * H), a(4 * H),       # intra fwd
               a(CH, 4 * H), a(H, 4 * H), a(4 * H),       # intra bwd
               a(H, CH), a(H, CH), a(CH), a(CH), a(CH),   # proj + LN
               a(CH, 4 * H), a(H, 4 * H), a(4 * H),       # inter
               a(H, CH), a(CH), a(CH), a(CH)]             # proj + LN
    return tuple(ws)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((F, K, B, CH)).astype(np.float32)
                    * 0.1).astype(jnp.bfloat16)
    h_in, c_in = init_carries(N_BLOCKS, F, B, H, jnp.bfloat16)
    weights = make_weights(rng)

    import os
    tiles = tuple(int(t) for t in os.environ.get('TILES', '128,64,32').split(','))
    for bt in tiles:
        run = jax.jit(lambda x, h, c, _bt=bt: dual_path_chunk(
            x, h, c, weights, b_tile=_bt, dot_dtype=jnp.bfloat16,
            xscr_half=True))
        try:
            y, h, c = run(x, h_in, c_in)
            float(jnp.sum(y.astype(jnp.float32)))  # true-completion sync
            n, t0 = 30, time.perf_counter()
            for _ in range(n):
                y, h, c = run(x, h_in, c_in)
            float(jnp.sum(y.astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / n * 1000
            print({"B": B, "b_tile": bt, "ms": round(ms, 3)}, flush=True)
        except Exception as e:
            print({"B": B, "b_tile": bt,
                   "err": f"{type(e).__name__}: {str(e)[:100]}"}, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
