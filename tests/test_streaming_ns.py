"""Streaming NS (DPCRN) equivalence tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.dpcrn import DPCRN
from puresound_tpu.nnet.encoder import ConvEncDec
from puresound_tpu.streaming.ns_engine import StreamingNS

KEY = jax.random.PRNGKey(0)


def _small_dpcrn(input_dim=128):
    return DPCRN(input_type="RI", input_dim=input_dim, norm_type="bN2d",
                 dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                 transpose_t_size=2, transpose_delay=False,
                 kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                 dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                 stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                 delay=(0, 0, 0, 0, 0), rnn_hidden=16)


def test_dpcrn_stream_frames_equals_offline(rng):
    """masker.stream_frames over chunks == offline __call__."""
    m = _small_dpcrn()
    B, C, T = 2, 128, 24
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    variables = m.init(KEY, x)
    y_off = m.apply(variables, x)

    state = m.apply(variables, B, method=DPCRN.init_stream_state)
    outs = []
    for k in range(0, T, 6):
        y, state = m.apply(variables, x[:, :, k:k + 6], state,
                           method=DPCRN.stream_frames)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=2e-5, rtol=1e-4)


def test_streaming_ns_engine_equals_offline(rng):
    """Full pipeline: streamed chunks == offline inference on the
    zero-primed input (interior samples)."""
    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = _small_dpcrn(input_dim=n_fft)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               drop_first_bin=True, mask_constraint="linear",
                               f_type="Complex", mask_type="Complex")
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)

    L = 32 * 40
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = offline.init(KEY, x, method=SoTaskWrapModule.inference)

    pad = n_fft - hop
    x_primed = jnp.pad(x, ((0, 0), (pad, 0)))
    y_off = np.asarray(offline.apply(variables, x_primed,
                                     method=SoTaskWrapModule.inference))

    state = engine.apply(variables, 2, method=StreamingNS.init_state)
    outs = []
    chunk = hop * 4
    for i in range(0, L, chunk):
        y, state = engine.apply(variables, x[:, i:i + chunk], state,
                                method=StreamingNS.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)

    # offline's edge normalizer differs on the first n_fft-hop samples
    lo = n_fft
    hi = y_stream.shape[-1]
    np.testing.assert_allclose(y_stream[:, lo:hi], y_off[:, lo:hi],
                               atol=3e-5, rtol=1e-3)


def test_streaming_ns_rejects_noncausal():
    m = DPCRN(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8), transpose_t_size=2, transpose_delay=True,
              kernel_t=(2, 2), stride_t=(1, 1), dilation_t=(1, 1),
              kernel_f=(5, 3), stride_f=(2, 2), dilation_f=(1, 1),
              delay=(0, 0), rnn_hidden=8)
    x = jnp.zeros((1, 64, 8))
    variables = m.init(KEY, x)
    with pytest.raises(AssertionError):
        m.apply(variables, 1, method=DPCRN.init_stream_state)


def test_dparn_stream_frames_equals_offline(rng):
    """DPARN streaming (attention intra is frame-local) == offline."""
    from puresound_tpu.nnet.dparn import DPARN

    m = DPARN(input_type="RI", input_dim=128, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8, 16, 16, 32), transpose_t_size=2,
              transpose_delay=False, kernel_t=(2, 2, 2, 2, 2),
              stride_t=(1, 1, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
              kernel_f=(5, 3, 3, 3, 3), stride_f=(2, 2, 1, 1, 1),
              dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0),
              rnn_hidden=16, nhead=4)
    B, C, T = 2, 128, 18
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    variables = m.init(KEY, x)
    y_off = m.apply(variables, x)

    state = m.apply(variables, B, method=DPARN.init_stream_state)
    outs = []
    for k in range(0, T, 6):
        y, state = m.apply(variables, x[:, :, k:k + 6], state,
                           method=DPARN.stream_frames)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=2e-5, rtol=1e-4)
