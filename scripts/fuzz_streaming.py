"""Randomized streamed==offline equivalence fuzz.

Samples random causal-streamable geometries per model family (DPCRN /
DPARN / UnetTcn / UnetFsmn / SkiM-TSE), random chunk splits, and f32/bf16
serving dtypes, and asserts the streaming path matches the offline forward
(f32) or stays within quantization distance (bf16). Fixed-geometry tests
have repeatedly masked shape/dtype bugs (round-3 scratch-shape bug, the
bf16 stock-DPARN dtype bugs) — this sweeps the configuration space.

Usage: python scripts/fuzz_streaming.py [n_trials] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

KEY = jax.random.PRNGKey(0)


def _rand_dual_path(rng, cls):
    n = int(rng.integers(2, 5))
    chans = [1] + [int(2 ** rng.integers(2, 5)) for _ in range(n)]
    kf = [int(rng.choice([3, 5]))] + [3] * (n - 1)
    sf = [int(rng.choice([1, 2])) for _ in range(n)]
    kw = dict(input_type="RI", input_dim=128, norm_type="bN2d", dropout=0.0,
              channels=tuple(chans), transpose_t_size=2,
              transpose_delay=bool(rng.integers(0, 2)),
              kernel_t=(2,) * n, stride_t=(1,) * n, dilation_t=(1,) * n,
              kernel_f=tuple(kf), stride_f=tuple(sf), dilation_f=(1,) * n,
              delay=(0,) * n, rnn_hidden=int(2 ** rng.integers(3, 6)))
    if cls.__name__.startswith("DPARN"):
        kw["nhead"] = int(rng.choice([2, 4]))
    return cls(**kw), kw


def _run_dual_path(rng, cls, half):
    m, kw = _rand_dual_path(rng, cls)
    B, C, T = int(rng.integers(1, 4)), 128, int(rng.integers(10, 24))
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    variables = m.init(KEY, x)
    delay = getattr(m, "stream_delay_frames", 0) if kw["transpose_delay"] else 0
    y_off = np.asarray(m.apply(variables, x))

    if half:
        from puresound_tpu.streaming.halfprec import to_half

        variables = to_half(variables)
    dt = jnp.bfloat16 if half else jnp.float32
    state = m.apply(variables, B, dt, method=cls.init_stream_state)
    outs, k = [], 0
    while k < T:
        step = int(rng.integers(1, 8))
        y, state = m.apply(variables, x[:, :, k:k + step].astype(dt), state,
                           method=cls.stream_frames)
        outs.append(np.asarray(y.astype(jnp.float32)))
        k += step
    y_st = np.concatenate(outs, axis=-1)
    if delay:
        y_st, y_off = y_st[..., delay:], y_off[..., :T - delay]
    if half:
        err = ((y_st - y_off) ** 2).sum()
        sig = (y_off ** 2).sum() + 1e-20
        snr = 10 * np.log10(sig / max(err, 1e-20))
        assert snr > 25.0, f"bf16 snr {snr:.1f} dB kw={kw}"
    else:
        np.testing.assert_allclose(y_st, y_off, atol=3e-5, rtol=1e-3,
                                   err_msg=str(kw))


def _run_skim_tse(rng, half):
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    win = int(rng.choice([8, 16, 32]))
    # 50% or 75% encoder overlap: the 75% case makes win - hop exceed small
    # chunks, exercising the multi-chunk decode-tail carry (round-3i fix)
    hop = win // int(rng.choice([2, 4]))
    lat = int(rng.choice([16, 24, 32]))
    seg = int(rng.integers(4, 12))
    nb = int(rng.integers(1, 4))
    hid = int(2 ** rng.integers(3, 6))
    emb = 8
    kw = dict(win=win, lat=lat, seg=seg, nb=nb, hid=hid)
    engine = StreamingTSE(
        encoder=FreeEncDec(win_length=win, hop_length=hop, laten_length=lat,
                           output_active=True),
        masker=SkiM(input_size=lat, hidden_size=hid, output_size=lat,
                    n_blocks=nb, seg_size=seg, causal=True, embed_dim=emb,
                    embed_norm=True, embed_fusion="FiLM",
                    block_with_embed=(1,) * nb),
        speaker_net=(TCN(lat, hid, 3, dilation=1, causal=False,
                         tcn_norm="gLN", dconv_norm="gGN"),
                     AttentiveStatisticsPooling(lat, 16),
                     Conv1d(2 * lat, emb, 1, use_bias=False)),
        mask_constraint="ReLU")
    B = int(rng.integers(1, 4))
    n_segs = int(rng.integers(2, 5))
    chunk = hop * seg  # whole segments per chunk
    L = chunk * n_segs
    x = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((B, win * 20)).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(x[:, :chunk]),
                            jnp.asarray(enroll),
                            method=StreamingTSE.init_all)
    dvec = np.asarray(engine.apply(variables, jnp.asarray(enroll),
                                   method=StreamingTSE.embed))
    # offline == one-shot streaming of the whole signal
    st = engine.apply(variables, B, method=StreamingTSE.init_state)
    y_full, _ = engine.apply(variables, jnp.asarray(x), jnp.asarray(dvec),
                             st, method=StreamingTSE.step)
    y_full = np.asarray(y_full)

    if half:
        from puresound_tpu.streaming.halfprec import to_half

        variables = to_half(variables)
    dt = jnp.bfloat16 if half else jnp.float32
    st = engine.apply(variables, B, dt, method=StreamingTSE.init_state)
    outs = []
    for k in range(n_segs):
        y, st = engine.apply(variables,
                             jnp.asarray(x[:, k * chunk:(k + 1) * chunk]).astype(dt),
                             jnp.asarray(dvec).astype(dt), st,
                             method=StreamingTSE.step)
        outs.append(np.asarray(y.astype(jnp.float32)))
    y_st = np.concatenate(outs, axis=-1)
    if half:
        err = ((y_st - y_full) ** 2).sum()
        snr = 10 * np.log10(((y_full ** 2).sum() + 1e-20) / max(err, 1e-20))
        assert snr > 25.0, f"bf16 snr {snr:.1f} dB kw={kw}"
    else:
        np.testing.assert_allclose(y_st, y_full, atol=3e-5, rtol=1e-3,
                                   err_msg=str(kw))


def main(n_trials=40, seed=0):
    from puresound_tpu.nnet.dparn import DPARN
    from puresound_tpu.nnet.dpcrn import DPCRN

    rng = np.random.default_rng(seed)
    fams = [("dpcrn", lambda r, h: _run_dual_path(r, DPCRN, h)),
            ("dparn", lambda r, h: _run_dual_path(r, DPARN, h)),
            ("skim_tse", _run_skim_tse)]
    fails = 0
    for t in range(n_trials):
        name, fn = fams[t % len(fams)]
        half = bool(rng.integers(0, 2))
        try:
            fn(rng, half)
            print(f"[{t+1}/{n_trials}] {name} half={half}: ok", flush=True)
        except AssertionError as e:
            fails += 1
            print(f"[{t+1}/{n_trials}] {name} half={half}: FAIL\n{e}",
                  flush=True)
    print(f"done: {n_trials - fails}/{n_trials} ok")
    return fails


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(1 if main(n, s) else 0)
