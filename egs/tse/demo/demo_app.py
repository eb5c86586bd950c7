"""Real-time streaming TSE demo.

The reference demo (egs/tse/demo/demo_app.py) is a tkinter microphone app;
this environment has no audio devices, so the demo streams a wav file
through the jitted chunk step in real-time cadence and reports per-chunk
latency / RTF — the same enroll -> stream -> reconstruct pipeline.

Usage:
  python demo_app.py --ckpt models/epoch_N.ckpt --enroll enroll.wav \
      --input noisy.wav --output enhanced.wav [--chunk-ms 20]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from utils import DemoSpeakerNet, DemoTseNet


def build_flagship_engine():
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                         output_active=True)
    masker = SkiM(input_size=128, hidden_size=256, output_size=128,
                  n_blocks=4, seg_size=150, seg_overlap=False, causal=True,
                  embed_dim=192, embed_norm=True, embed_fusion="FiLM",
                  block_with_embed=(1, 1, 1, 1))
    speaker_net = tuple(
        [TCN(128, 256, 3, dilation=2**i, causal=False, tcn_norm="gLN",
             dconv_norm="gGN") for i in range(5)]
        + [AttentiveStatisticsPooling(128, 128),
           Conv1d(256, 192, 1, use_bias=False)])
    return StreamingTSE(encoder=encoder, masker=masker,
                        speaker_net=speaker_net, mask_constraint="ReLU")


def load_or_init(build_engine, ckpt):
    """Build the flagship engine and load a checkpoint into it (random
    weights with a warning when ckpt is None). Shared with mic_demo.py."""
    import jax
    import jax.numpy as jnp

    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.tasks.base import BaseTrainer

    engine = build_engine()
    x0 = jnp.zeros((1, 320))
    e0 = jnp.zeros((1, 3200))
    variables = engine.init(jax.random.PRNGKey(0), x0, e0,
                            method=StreamingTSE.init_all)
    if ckpt:
        variables = BaseTrainer.load_params_from_ckpt(ckpt, variables)
        print(f"loaded checkpoint {ckpt}")
    else:
        print("WARNING: running with random weights (no --ckpt given)")
    return engine, variables


def main(args):
    from puresound_tpu.src.audio import AudioIO

    engine, variables = load_or_init(build_flagship_engine, args.ckpt)

    sr = 16000
    enroll, esr = AudioIO.open(args.enroll, target_lvl=-28)
    if esr != sr:
        enroll = AudioIO.resample(enroll, esr, sr)
    noisy, nsr = AudioIO.open(args.input)
    if nsr != sr:
        noisy = AudioIO.resample(noisy, nsr, sr)
    noisy = noisy[0]

    spk_net = DemoSpeakerNet(engine, variables)
    dvec = spk_net.get_speaker_embedding(enroll)
    print(f"speaker embedding: {dvec.shape}")

    tse = DemoTseNet(engine, variables)
    chunk = int(sr * args.chunk_ms / 1000)
    chunk -= chunk % 16  # hop-aligned
    outs = []
    lat = []
    n_chunks = len(noisy) // chunk
    for i in range(n_chunks):
        t0 = time.perf_counter()
        out = tse.streaming_inference_chunk(noisy[i * chunk:(i + 1) * chunk], dvec)
        lat.append((time.perf_counter() - t0) * 1000)
        outs.append(out.reshape(-1))
    enh = np.concatenate(outs)
    AudioIO.save(enh.reshape(1, -1), args.output, sr)
    lat = np.asarray(lat[1:])  # drop compile step
    print(f"streamed {n_chunks} chunks of {args.chunk_ms} ms")
    print(f"latency p50/p95/max: {np.percentile(lat, 50):.2f}/"
          f"{np.percentile(lat, 95):.2f}/{lat.max():.2f} ms")
    print(f"real-time factor: {np.mean(lat) / args.chunk_ms:.3f} "
          f"({args.chunk_ms / np.mean(lat):.1f}x real time)")
    print(f"saved {args.output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--enroll", type=str, required=True)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="enhanced.wav")
    parser.add_argument("--chunk-ms", type=float, default=20.0)
    main(parser.parse_args())
