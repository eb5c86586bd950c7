"""One-off TPU experiment: dual-path kernel sub-tile interleave (T tiles
per grid program) vs the single-tile kernel, at NS capacity-relevant
batches. The kernel is per-iteration latency bound (~5.7 us/serial step);
T-fold interleave cuts serial iterations T-fold while keeping every
vector temporary at the known-compilable 128-row size.

Run: python scripts/exp_dp_subtiles.py [B ...]
"""
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo root)

bench._enable_compile_cache()


def main():
    batches = [int(a) for a in sys.argv[1:]] or [2048, 3584, 4096]
    engine, variables = bench.build_ns_engine()
    for B in batches:
        row = {"B": B}
        for T in (1, 2, 4):
            try:
                ms, _, _ = bench.measure_ns_step_ms(
                    engine, variables, B, dp_sub_tiles=T)
                row[f"T{T}"] = round(ms, 3)
            except Exception as e:
                row[f"T{T}"] = f"{type(e).__name__}: {str(e)[:120]}"
            print(row, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
