"""A/B the fused-projection LSTM train kernel on the flagship TPU step.

Round-4 result (B=64, 2 s clips, bf16 mixed, fused scan+tcn): 47.39 ms
(fp off) -> 41.88 ms (fp on), bytes/step 29.6 -> 25.8 GB, first-step
loss bit-identical. Measured through bench.measure_train — an earlier
version wrapped the step in an extra jax.jit lambda and measured ~2.6
s/step on the tunneled backend (wrapper overhead artifact, not device
time); always A/B through the canonical bench path.

Run ON TPU: python scripts/exp_train_fused_proj.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench._enable_compile_cache()

import puresound_tpu.nnet.lobe.rnn as rnn_mod  # noqa: E402


def main():
    B = int(os.environ.get("B", 64))
    for fp in (False, True):
        rnn_mod.FUSED_PROJ_SCAN = fp
        ms, sps, roof = bench.measure_train(mixed=True, B=B)
        print(f"fused_proj={'ON ' if fp else 'OFF'}: {ms:.2f} ms/step "
              f"({sps:.1f} audio-s/s, {roof['mbytes_per_step']:.0f} MB/step, "
              f"hbm {roof['hbm_util_pct']:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
