"""Sweep the fused-projection LSTM train kernel's batch tile at the
flagship B=64 step (rows 896). Auto pick is 448 (nb=2); smaller tiles
mean more serial grid iterations but smaller VMEM blocks.

Run ON TPU: python scripts/exp_fp_btile.py [tiles...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench._enable_compile_cache()

import puresound_tpu.nnet.lobe.rnn as rnn_mod  # noqa: E402
import puresound_tpu.ops.lstm_train_kernel as k  # noqa: E402


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [448, 224, 128]
    rnn_mod.FUSED_PROJ_SCAN = True
    orig = k._resolve_tile
    for t in tiles:
        k._resolve_tile = (lambda B, bt, _t=t:
                           orig(B, _t if B % _t == 0 else bt))
        try:
            ms, sps, roof = bench.measure_train(mixed=True, B=64)
            print(f"b_tile={t}: {ms:.2f} ms/step ({sps:.1f} audio-s/s)",
                  flush=True)
        except Exception as e:
            print(f"b_tile={t}: failed {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        finally:
            k._resolve_tile = orig


if __name__ == "__main__":
    main()
