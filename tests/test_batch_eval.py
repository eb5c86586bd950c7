"""Bucketed batched evaluation (puresound_tpu/tasks/batch_eval.py).

The reference scores dev sets one utterance at a time at native length
(reference: egs/tse/main.py:154-216); under XLA that is one compile per
distinct length. BucketedBatchRunner replaces that loop with length
buckets + fixed device batches; these tests pin down the bucketing,
padding, ordering, and slicing semantics, plus end-to-end equivalence
with per-utterance inference on a causal TSE model.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.conv_tasnet import TCN
from puresound_tpu.nnet.lobe.cnn import Conv1d
from puresound_tpu.nnet.encoder import FreeEncDec
from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
from puresound_tpu.nnet.skim import SkiM
from puresound_tpu.tasks.batch_eval import BucketedBatchRunner, quantize_length

import jax

KEY = jax.random.PRNGKey(0)


def test_quantize_length():
    assert quantize_length(1, 100) == 100
    assert quantize_length(100, 100) == 100
    assert quantize_length(101, 100) == 200
    assert quantize_length(250, 100) == 300
    with pytest.raises(ValueError):
        quantize_length(10, 0)


def test_runner_order_buckets_and_slicing(rng):
    """Items come back in submission order with true lengths, grouped into
    the expected number of buckets; zero-pad + causal fn => exact."""
    shapes_seen = []

    def fn(x):  # causal: output[t] depends only on x[:t+1]
        shapes_seen.append(x.shape)
        return jnp.cumsum(x, axis=-1)

    runner = BucketedBatchRunner(fn, batch_size=2, quantum=100,
                                 pad_modes=("zero",), use_jit=False)
    lengths = [37, 150, 98, 205, 140, 60, 101]
    items = [(rng.standard_normal((1, L)).astype(np.float32),)
             for L in lengths]
    outs = runner.run(items)

    assert len(outs) == len(items)
    # outputs are per-item ROWS (batch axis dropped; callers re-add [None])
    for (x,), o, L in zip(items, outs, lengths):
        assert o.shape == (L,)
        np.testing.assert_allclose(np.asarray(o),
                                   np.cumsum(x, axis=-1)[0], rtol=1e-5,
                                   atol=1e-6)
    # lengths 37,98,60 -> 100; 150,140,101 -> 200; 205 -> 300
    assert sorted(runner.bucket_keys) == [(100,), (200,), (300,)]
    # every device call is one of the 3 bucket shapes at fixed batch 2
    assert set(shapes_seen) == {(2, 100), (2, 200), (2, 300)}


def test_runner_tile_pad_and_multi_input():
    """Enrollment-style inputs tile-pad (cyclic repeat): statistics over
    the padded axis are preserved exactly when the bucket is a multiple
    of the true length."""
    def fn(x, e):
        return x + jnp.mean(e, axis=-1, keepdims=True)

    runner = BucketedBatchRunner(fn, batch_size=4, quantum=100,
                                 pad_modes=("zero", "tile"), use_jit=False)
    x = np.ones((1, 80), np.float32)
    e = np.arange(50, dtype=np.float32)[None]  # tiles 2x into bucket 100
    (out,) = runner.run([(x, e)])
    np.testing.assert_allclose(np.asarray(out), (x + e.mean())[0],
                               rtol=1e-6)

    with pytest.raises(ValueError):  # arity mismatch
        runner.run([(x,)])
    with pytest.raises(ValueError):  # unknown pad mode
        BucketedBatchRunner(fn, pad_modes=("zero", "wrap"),
                            use_jit=False).run([(x, e)])
    with pytest.raises(ValueError):  # quanta/pad_modes length mismatch
        BucketedBatchRunner(fn, quantum=(100,),
                            pad_modes=("zero", "tile"), use_jit=False)


def test_runner_per_input_quanta():
    """A coarser grid on the secondary input collapses the bucket-key
    cross product (continuously varying enroll lengths must not compile
    per utterance)."""
    def fn(x, e):
        return x

    runner = BucketedBatchRunner(fn, batch_size=2, quantum=(100, 400),
                                 pad_modes=("zero", "tile"), use_jit=False)
    items = [(np.ones((1, 90), np.float32),
              np.ones((1, 150 + 7 * i), np.float32)) for i in range(5)]
    runner.run(items)
    assert runner.bucket_keys == [(100, 400)]  # one compile, not five


def test_runner_no_out_slice():
    """out_slice_axis=None: embedding-style outputs pass through whole."""
    def fn(x):
        return jnp.stack([jnp.sum(x, axis=-1), jnp.max(x, axis=-1)], -1)

    runner = BucketedBatchRunner(fn, batch_size=3, quantum=10,
                                 pad_modes=("zero",), out_slice_axis=None,
                                 use_jit=False)
    items = [(np.full((1, L), i + 1, np.float32),)
             for i, L in enumerate([5, 17, 9])]
    outs = runner.run(items)
    for i, (o, L) in enumerate(zip(outs, [5, 17, 9])):
        assert o.shape == (2,)
        np.testing.assert_allclose(np.asarray(o)[0], (i + 1) * L,
                                   rtol=1e-6)


def _small_tse():
    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=24,
                         output_active=True)
    masker = SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                  seg_size=10, seg_overlap=False, causal=True, embed_dim=8,
                  embed_norm=True, embed_fusion="FiLM",
                  block_with_embed=(1, 1))
    speaker_net = tuple(
        [TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
             dconv_norm="gGN")]
        + [AttentiveStatisticsPooling(24, 16),
           Conv1d(48, 8, 1, use_bias=False)])
    return SoTaskWrapModule(encoder=encoder, masker=masker,
                            speaker_net=speaker_net, mask_constraint="ReLU")


def test_batch_eval_matches_per_utterance_tse(rng):
    """End-to-end: bucketed-batched inference == per-utterance inference on
    a causal TSE model, away from the padded tail's overlap-add window.

    Enroll lengths sit exactly on the bucket grid so the 'tile' pad is a
    no-op and equality is exact (up to batching numerics)."""
    model = _small_tse()
    quantum = 640  # 40 frames at hop 16
    win = 32

    lengths = [500, 640, 1000, 1100]
    items = [(rng.standard_normal((1, L)).astype(np.float32) * 0.1,
              rng.standard_normal((1, quantum)).astype(np.float32) * 0.1)
             for L in lengths]
    variables = model.init(KEY, jnp.asarray(items[0][0]),
                           jnp.asarray(items[0][1]),
                           method=SoTaskWrapModule.inference)

    def infer(n, e):
        return model.apply(variables, n, e,
                           method=SoTaskWrapModule.inference)

    runner = BucketedBatchRunner(infer, batch_size=2, quantum=quantum,
                                 pad_modes=("zero", "tile"))
    outs = runner.run(items)
    assert sorted(runner.bucket_keys) == [(640, 640), (1280, 640)]

    for (x, e), o, L in zip(items, outs, lengths):
        ref = np.asarray(infer(jnp.asarray(x), jnp.asarray(e)))[0]
        assert o.shape[-1] == L
        keep = L - win  # trailing OLA window may see padded frames
        np.testing.assert_allclose(np.asarray(o)[..., :keep],
                                   ref[..., :keep], atol=1e-4, rtol=1e-3)


def test_batch_eval_tile_padded_enroll_runs(rng):
    """Off-grid enroll lengths tile-pad; output is finite, right-shaped,
    and close to the per-utterance result (seam effects only perturb the
    pooled speaker stats slightly)."""
    model = _small_tse()
    x = rng.standard_normal((1, 700)).astype(np.float32) * 0.1
    e = rng.standard_normal((1, 480)).astype(np.float32) * 0.1
    variables = model.init(KEY, jnp.asarray(x), jnp.asarray(e),
                           method=SoTaskWrapModule.inference)

    def infer(n, en):
        return model.apply(variables, n, en,
                           method=SoTaskWrapModule.inference)

    runner = BucketedBatchRunner(infer, batch_size=2, quantum=640,
                                 pad_modes=("zero", "tile"))
    (out,) = runner.run([(x, e)])
    assert out.shape[-1] == 700
    assert np.isfinite(np.asarray(out)).all()
    ref = np.asarray(infer(jnp.asarray(x), jnp.asarray(e)))[0, :668]
    got = np.asarray(out)[..., :668]
    err = np.linalg.norm(got - ref)
    snr = 20 * np.log10(np.linalg.norm(ref) / max(err, 1e-12))
    assert snr > 10, f"tile-padded enroll diverged: {snr:.1f} dB"
