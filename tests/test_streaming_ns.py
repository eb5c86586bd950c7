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


def test_streaming_ns_rejects_nonstreamable():
    """Per-layer delay lookahead in the down path can't stream."""
    m = DPCRN(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8), transpose_t_size=2, transpose_delay=False,
              kernel_t=(2, 2), stride_t=(1, 1), dilation_t=(1, 1),
              kernel_f=(5, 3), stride_f=(2, 2), dilation_f=(1, 1),
              delay=(1, 0), rnn_hidden=8)
    x = jnp.zeros((1, 64, 8))
    variables = m.init(KEY, x)
    with pytest.raises(AssertionError):
        m.apply(variables, 1, method=DPCRN.init_stream_state)


def test_dpcrn_transpose_delay_stream_equals_offline(rng):
    """ns_dpcrn_v0-style lookahead config (transpose_delay=True): streamed
    mask == offline mask delayed by n_layers frames (skip-FIFO realignment)."""
    m = DPCRN(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8), transpose_t_size=2, transpose_delay=True,
              kernel_t=(2, 2), stride_t=(1, 1), dilation_t=(1, 1),
              kernel_f=(5, 3), stride_f=(2, 2), dilation_f=(1, 1),
              delay=(0, 0), rnn_hidden=8)
    B, C, T = 2, 64, 30
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    variables = m.init(KEY, x)
    y_off = np.asarray(m.apply(variables, x))
    D = m.stream_delay_frames
    assert D == 2

    for chunk in (5, 1):
        state = m.apply(variables, B, method=DPCRN.init_stream_state)
        outs = []
        for k in range(0, T, chunk):
            y, state = m.apply(variables, x[:, :, k:k + chunk], state,
                               method=DPCRN.stream_frames)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(y_stream[..., D:], y_off[..., :T - D],
                                   atol=2e-5, rtol=1e-4)


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


def _small_unet_tcn(input_dim=64, emb=8):
    from puresound_tpu.nnet.unet import UnetTcn

    return UnetTcn(
        embed_dim=emb, embed_norm=True, input_type="RI", input_dim=input_dim,
        activation_type="PReLU", norm_type="bN2d",
        channels=(1, 4, 8, 8), transpose_t_size=2, transpose_delay=True,
        skip_conv=False, kernel_t=(2, 2, 2), kernel_f=(5, 5, 5),
        stride_t=(1, 1, 1), stride_f=(2, 2, 2),
        dilation_t=(1, 1, 1), dilation_f=(1, 1, 1), delay=(0, 0, 0),
        tcn_layer="gated", tcn_kernel=3, tcn_dim=16, tcn_dilated_basic=2,
        per_tcn_stack=2, repeat_tcn=2, tcn_with_embed=(1, 0),
        tcn_norm="bN1d", dconv_norm="bN1d", causal=True, tcn_use_film=False)


def test_unet_tcn_stream_frames_equals_offline(rng):
    """UnetTcn (transpose_delay): streamed mask == offline mask delayed by
    stream_delay_frames; frame-by-frame chunking exercises the skip FIFOs."""
    from puresound_tpu.nnet.unet import UnetTcn

    m = _small_unet_tcn()
    B, C, T = 2, 64, 40
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    dvec = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    variables = m.init(KEY, x, dvec)
    y_off = np.asarray(m.apply(variables, x, dvec))
    D = m.stream_delay_frames
    assert D == 3

    for chunk in (5, 1):
        state = m.apply(variables, B, method=UnetTcn.init_stream_state)
        outs = []
        for k in range(0, T, chunk):
            y, state = m.apply(variables, x[:, :, k:k + chunk], state, dvec,
                               method=UnetTcn.stream_frames)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(y_stream[..., D:], y_off[..., :T - D],
                                   atol=2e-5, rtol=1e-4)


def test_streaming_tse_unet_tcn_engine(rng):
    """Full STFT-TSE pipeline: streamed chunks == offline inference on the
    zero-primed input, delayed by the masker lookahead (D * hop samples)."""
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.lobe.trivial import Magnitude

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = _small_unet_tcn(input_dim=n_fft)
    speaker_net = (Magnitude(drop_first=False),
                   AttentiveStatisticsPooling(n_fft // 2, 16),
                   Conv1d(n_fft, 8, 1, use_bias=False))
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net, drop_first_bin=True,
                               mask_constraint="linear")
    engine = StreamingNS(encoder=encoder, masker=masker,
                         speaker_net=speaker_net, mask_constraint="linear",
                         drop_first_bin=True, f_type="real", mask_type="real")

    L = hop * 40
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((2, 8 * hop)).astype(np.float32))
    variables = offline.init(KEY, x, enroll,
                             method=SoTaskWrapModule.inference)

    pad = n_fft - hop
    y_off = np.asarray(offline.apply(variables, jnp.pad(x, ((0, 0), (pad, 0))),
                                     enroll, method=SoTaskWrapModule.inference))

    dvec = engine.apply(variables, enroll, method=StreamingNS.embed)
    dvec_off = np.asarray(offline.apply(
        variables, enroll, method=SoTaskWrapModule.inference_tse_embedding))
    np.testing.assert_allclose(np.asarray(dvec), dvec_off.reshape(dvec.shape),
                               atol=1e-6)

    state = engine.apply(variables, 2, method=StreamingNS.init_state)
    outs = []
    chunk = hop * 4
    for i in range(0, L, chunk):
        y, state = engine.apply(variables, x[:, i:i + chunk], state, dvec,
                                method=StreamingNS.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)

    Dh = masker.stream_delay_frames * hop
    lo = n_fft
    hi = y_stream.shape[-1]
    np.testing.assert_allclose(y_stream[:, lo + Dh:hi], y_off[:, lo:hi - Dh],
                               atol=3e-5, rtol=1e-3)


def test_file_eval_stream_signal_alignment(rng):
    """stream_signal returns an input-aligned signal equal to offline
    inference on the zero-primed input (interior samples), including the
    lookahead delay trim."""
    from puresound_tpu.streaming.file_eval import (engine_delay_samples,
                                                   stream_signal)

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPCRN(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8), transpose_t_size=2,
                   transpose_delay=True, kernel_t=(2, 2), stride_t=(1, 1),
                   dilation_t=(1, 1), kernel_f=(5, 3), stride_f=(2, 2),
                   dilation_f=(1, 1), delay=(0, 0), rnn_hidden=8)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               drop_first_bin=True, mask_constraint="linear",
                               f_type="Complex", mask_type="Complex")
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)
    delay = engine_delay_samples(engine)
    assert delay == (n_fft - hop) + 2 * hop

    L = 3210  # deliberately not a chunk multiple
    x = rng.standard_normal(L).astype(np.float32) * 0.1
    variables = offline.init(KEY, jnp.asarray(x[None, :hop * 8]),
                             method=SoTaskWrapModule.inference)

    out, rtf = stream_signal(engine, variables, x, sr=16000, chunk_ms=8.0)
    assert out.shape == (L,) and rtf > 0

    pad = n_fft - hop
    y_off = np.asarray(offline.apply(
        variables, jnp.pad(jnp.asarray(x[None]), ((0, 0), (pad, 0))),
        method=SoTaskWrapModule.inference))[0]
    # out[t] is aligned with the INPUT timeline; the offline output lives on
    # the primed timeline (shifted by pad). Skip the first/last window edges
    # (offline edge normalizer + offline frame-alignment truncation).
    hi = L - 2 * n_fft  # offline also truncates the unaligned input tail
    np.testing.assert_allclose(out[n_fft:hi], y_off[n_fft + pad:hi + pad],
                               atol=3e-5, rtol=1e-3)


@pytest.mark.parametrize("tdelay,film", [(False, True), (True, False)])
def test_unet_fsmn_stream_frames_equals_offline(rng, tdelay, film):
    """UnetFsmn streaming (FSMN context-conv rings; memory chains across
    layers within the chunk) == offline, causal and lookahead modes, both
    FiLM and concat-proj conditioning."""
    from puresound_tpu.nnet.unet import UnetFsmn

    m = UnetFsmn(
        embed_dim=8, embed_norm=True, input_type="RI", input_dim=64,
        activation_type="PReLU", norm_type="bN2d",
        channels=(1, 4, 8, 8), transpose_t_size=2, transpose_delay=tdelay,
        skip_conv=False, kernel_t=(2, 2, 2), kernel_f=(5, 5, 5),
        stride_t=(1, 1, 1), stride_f=(2, 2, 2),
        dilation_t=(1, 1, 1), dilation_f=(1, 1, 1), delay=(0, 0, 0),
        fsmn_l_context=3, fsmn_r_context=0, fsmn_dim=16, num_fsmn=4,
        fsmn_with_embed=(1, 0, 1, 0), fsmn_norm="bN1d", use_film=film)
    B, C, T = 2, 64, 40
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    dvec = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    variables = m.init(KEY, x, dvec)
    y_off = np.asarray(m.apply(variables, x, dvec))
    D = m.stream_delay_frames
    assert D == (3 if tdelay else 0)

    state = m.apply(variables, B, method=UnetFsmn.init_stream_state)
    outs = []
    for k in range(0, T, 5):
        y, state = m.apply(variables, x[:, :, k:k + 5], state, dvec,
                           method=UnetFsmn.stream_frames)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(y_stream[..., D:],
                               y_off[..., :T - D] if D else y_off,
                               atol=2e-5, rtol=1e-4)


def test_bf16_serving_mode_snr(rng):
    """Half-precision serving (to_half params + bf16 state): streamed
    output stays within quantization distance of the f32 pipeline over a
    long stream (no drift blow-up through the carried state)."""
    from puresound_tpu.streaming.halfprec import to_half

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = _small_dpcrn(input_dim=n_fft)
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)
    L = hop * 4 * 30
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = engine.init(KEY, x[:, :n_fft * 2], method=StreamingNS.init_all)

    def stream(v, dt):
        state = engine.apply(v, 2, dt, method=StreamingNS.init_state)
        outs = []
        for i in range(0, L, hop * 4):
            y, state = engine.apply(v, x[:, i:i + hop * 4].astype(dt), state,
                                    method=StreamingNS.step)
            outs.append(np.asarray(y.astype(jnp.float32)))
        return np.concatenate(outs, -1)

    y32 = stream(variables, jnp.float32)
    y16 = stream(to_half(variables), jnp.bfloat16)
    noise = y16 - y32
    snr = 10 * np.log10((y32 ** 2).sum() / max((noise ** 2).sum(), 1e-20))
    assert snr > 35.0, f"bf16 serving SNR {snr:.1f} dB"


def test_streaming_ns_engine_dp_kernel_equals_offline(rng):
    """Full pipeline with the fused dual-path Pallas kernel
    (dp_kernel=True, interpret on CPU) == offline inference."""
    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = _small_dpcrn(input_dim=n_fft)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               drop_first_bin=True, mask_constraint="linear",
                               f_type="Complex", mask_type="Complex")
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)

    L = 32 * 24
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = offline.init(KEY, x, method=SoTaskWrapModule.inference)

    pad = n_fft - hop
    x_primed = jnp.pad(x, ((0, 0), (pad, 0)))
    y_off = np.asarray(offline.apply(variables, x_primed,
                                     method=SoTaskWrapModule.inference))

    state = engine.apply(variables, 2, dp_kernel=True,
                         method=StreamingNS.init_state)
    outs = []
    chunk = hop * 2
    for i in range(0, L, chunk):
        y, state = engine.apply(variables, x[:, i:i + chunk], state,
                                dp_kernel=True, method=StreamingNS.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)

    lo = n_fft
    hi = y_stream.shape[-1]
    np.testing.assert_allclose(y_stream[:, lo:hi], y_off[:, lo:hi],
                               atol=3e-5, rtol=1e-3)


def test_dp_kernel_long_stream_no_drift(rng):
    """dp_kernel carries must not drift or blow up over a long stream:
    after 120 chunks the kernel path still matches the stock path."""
    m = _small_dpcrn(input_dim=64)
    B, C = 2, 64
    x0 = jnp.asarray(rng.standard_normal((B, C, 4)).astype(np.float32))
    v = m.init(KEY, x0)
    s_ref = m.apply(v, B, method=DPCRN.init_stream_state)
    s_k = m.apply(v, B, dp_kernel=True, method=DPCRN.init_stream_state)

    import jax as _jax
    ref_step = _jax.jit(lambda x, s: m.apply(v, x, s,
                                             method=DPCRN.stream_frames))
    k_step = _jax.jit(lambda x, s: m.apply(v, x, s, False, True, True,
                                           method=DPCRN.stream_frames))
    y_ref = y_k = None
    for step in range(120):
        x = jnp.asarray(rng.standard_normal((B, C, 2)).astype(np.float32))
        y_ref, s_ref = ref_step(x, s_ref)
        y_k, s_k = k_step(x, s_k)
    a, b = np.asarray(y_ref), np.asarray(y_k)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=5e-5, rtol=1e-3)


def test_streaming_ns_engine_mk_kernel_equals_offline(rng):
    """Full pipeline with the center-fused masker kernel (mk_kernel=True:
    d4 conv + dual-path + u0 in one Pallas call, interpret on CPU) ==
    offline inference."""
    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = _small_dpcrn(input_dim=n_fft)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               drop_first_bin=True, mask_constraint="linear",
                               f_type="Complex", mask_type="Complex")
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)

    L = 32 * 24
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = offline.init(KEY, x, method=SoTaskWrapModule.inference)

    pad = n_fft - hop
    x_primed = jnp.pad(x, ((0, 0), (pad, 0)))
    y_off = np.asarray(offline.apply(variables, x_primed,
                                     method=SoTaskWrapModule.inference))

    state = engine.apply(variables, 2, mk_kernel=True,
                         method=StreamingNS.init_state)
    assert "dc" in state["masker"] and len(state["masker"]["down"]) == 2
    outs = []
    chunk = hop * 2
    for i in range(0, L, chunk):
        y, state = engine.apply(variables, x[:, i:i + chunk], state,
                                mk_kernel=True, method=StreamingNS.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)

    lo = n_fft
    hi = y_stream.shape[-1]
    np.testing.assert_allclose(y_stream[:, lo:hi], y_off[:, lo:hi],
                               atol=3e-5, rtol=1e-3)


def test_dparn_bf16_stream_frames_mixed_dtype(rng):
    """bf16 serving through the STOCK DPARN streaming path: the intra
    attention upcasts activations to f32 mid-path while the carried conv
    contexts stay bf16 — the conv stream_apply carry taps must compute at
    the activation dtype (regression: lax.conv dtype-mismatch TypeError)."""
    from puresound_tpu.nnet.dparn import DPARN
    from puresound_tpu.streaming.halfprec import to_half

    m = DPARN(input_type="RI", input_dim=128, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8, 16, 16, 32), transpose_t_size=2,
              transpose_delay=False, kernel_t=(2, 2, 2, 2, 2),
              stride_t=(1, 1, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
              kernel_f=(5, 3, 3, 3, 3), stride_f=(2, 2, 1, 1, 1),
              dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0),
              rnn_hidden=16, nhead=4)
    B, C, T = 2, 128, 12
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    variables = m.init(KEY, x)
    y32, _ = m.apply(variables, x,
                     m.apply(variables, B, method=DPARN.init_stream_state),
                     method=DPARN.stream_frames)

    vh = to_half(variables)
    state = m.apply(vh, B, jnp.bfloat16, method=DPARN.init_stream_state)
    y16, state = m.apply(vh, x.astype(jnp.bfloat16), state,
                         method=DPARN.stream_frames)
    y16 = np.asarray(y16.astype(jnp.float32))
    assert np.isfinite(y16).all()
    err = ((y16 - np.asarray(y32)) ** 2).sum()
    sig = (np.asarray(y32) ** 2).sum()
    assert 10 * np.log10(sig / max(err, 1e-20)) > 25.0
