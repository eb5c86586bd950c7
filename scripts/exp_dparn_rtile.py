"""Sweep the DPARN intra-attention kernel row tile (r_tile) on real HW.

Round-3 measured DPARN capacity once (1,408 @ 15.79 ms) at the default
r_tile=64 with no tuning pass (DPCRN's dual-path kernel got a full
b_tile sweep). Rows per chunk = streams * 2 frames, so B=1024 -> R=2048:
r_tile 64 = 32 grid programs. Bigger tiles batch more rows per QKV/FF
matmul (MXU utilization) at more VMEM per program.

Run: python scripts/exp_dparn_rtile.py [B ...]
"""
import functools
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()


def main():
    Bs = [int(a) for a in sys.argv[1:]] or [1024]
    import puresound_tpu.ops.dparn_attention_kernel as ak

    orig = ak.dparn_intra_pass
    engine, variables = bench.build_dparn_engine()
    for B in Bs:
        for r_tile in (64, 128, 256, 512):
            ak.dparn_intra_pass = functools.partial(orig, r_tile=r_tile)
            try:
                ms, _, _ = bench.measure_ns_step_ms(
                    engine, variables, B, dp_kernel=False, attn_kernel=True)
                print({"B": B, "r_tile": r_tile, "step_ms": round(ms, 2)},
                      flush=True)
            except Exception as e:
                print({"B": B, "r_tile": r_tile,
                       "error": f"{type(e).__name__}: {str(e)[:120]}"},
                      flush=True)
    ak.dparn_intra_pass = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
