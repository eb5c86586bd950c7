"""Streaming <-> offline equivalence tests (the reference's key contract,
test/test_streaming.py, tightened: equivalence here is structural)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.conv_tasnet import TCN
from puresound_tpu.nnet.encoder import FreeEncDec
from puresound_tpu.nnet.lobe.cnn import Conv1d
from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.skim import MemLSTM, SegLSTM, SkiM
from puresound_tpu.streaming.engine import StreamingTSE, offline_equivalent_input

KEY = jax.random.PRNGKey(0)


def _skim_kw(causal=True):
    return dict(input_size=12, hidden_size=16, output_size=12, n_blocks=3,
                seg_size=10, seg_overlap=False, causal=causal, embed_dim=8,
                embed_norm=True, embed_fusion="FiLM",
                block_with_embed=(1, 0, 1))


def test_seg_lstm_stream_equals_offline(rng):
    """SegLSTM over a full segment == frame-by-frame with carried state."""
    m = SegLSTM(input_size=12, hidden_size=16, causal=True)
    x = jnp.asarray(rng.standard_normal((2, 10, 12)).astype(np.float32))
    p = m.init(KEY, x)
    y_full, h_full, c_full = m.apply(p, x)
    h = c = None
    outs = []
    for t in range(10):
        y, h, c = m.apply(p, x[:, t:t + 1, :], h, c)
        outs.append(y)
    y_step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_step), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_full), np.asarray(h), atol=1e-6)


def test_mem_lstm_stream_equals_offline(rng):
    """MemLSTM offline over S segments == S sequential streaming steps."""
    m = MemLSTM(hidden_size=16, causal=True)
    S = 5
    h = jnp.asarray(rng.standard_normal((1, S, 1, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, S, 1, 16)).astype(np.float32))
    p = m.init(KEY, h, c)
    h_off, c_off = m.apply(p, h, c)  # [D, S, 16] (N=1), causal-shifted

    h_states = c_states = None
    stream_h, stream_c = [], []
    for s in range(S):
        hs = h[:, s].reshape(1, 1, 16)  # [B, D, H]
        cs = c[:, s].reshape(1, 1, 16)
        h_out, c_out, h_states, c_states = m.apply(
            p, hs, cs, h_states, c_states, method=MemLSTM.step)
        stream_h.append(h_out)
        stream_c.append(c_out)
    # offline segment s init state == streaming output after segment s-1
    for s in range(1, S):
        np.testing.assert_allclose(np.asarray(h_off[:, s]),
                                   np.asarray(stream_h[s - 1][:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_off[:, s]),
                                   np.asarray(stream_c[s - 1][:, 0]), atol=1e-6)
    # segment 0 init is zeros
    np.testing.assert_allclose(np.asarray(h_off[:, 0]), 0.0, atol=0)


@pytest.mark.parametrize("T", [50, 57])
def test_skim_offline_vs_step_chunk_vs_step_frames(rng, T):
    """The reference's core contract (test_streaming.py:62-116) at f32."""
    kw = _skim_kw()
    m = SkiM(**kw)
    x = jnp.asarray(rng.standard_normal((2, 12, T)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    p = m.init(KEY, x, e)
    y_off = m.apply(p, x, e)

    K = kw["seg_size"]
    T_pad = ((T + K - 1) // K) * K
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (0, T_pad - T)))
    frames = jnp.swapaxes(x_pad, 1, 2)  # [B, T_pad, C]

    # chunk-aligned step_chunk
    state = m.apply(p, 2, method=SkiM.init_state)
    outs = []
    for s in range(T_pad // K):
        y, state = m.apply(p, frames[:, s * K:(s + 1) * K, :], e, state,
                           method=SkiM.step_chunk)
        outs.append(y)
    y_chunk = jnp.concatenate(outs, axis=-1)[:, :, :T]
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_chunk),
                               atol=2e-5, rtol=1e-4)

    # arbitrary-frame step_frames (13 frames at a time)
    state = m.apply(p, 2, method=SkiM.init_state)
    outs = []
    idx = 0
    while idx < T_pad:
        n = min(13, T_pad - idx)
        y, state = m.apply(p, frames[:, idx:idx + n, :], e, state,
                           method=SkiM.step_frames)
        outs.append(y)
        idx += n
    y_frames = jnp.concatenate(outs, axis=-1)[:, :, :T]
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_frames),
                               atol=2e-5, rtol=1e-4)


def _small_tse():
    """A small tse_skim-style model (same structure, smaller dims)."""
    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=24,
                         output_active=True)
    masker = SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                  seg_size=10, seg_overlap=False, causal=True, embed_dim=8,
                  embed_norm=True, embed_fusion="FiLM", block_with_embed=(1, 1))
    speaker_net = tuple(
        [TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
             dconv_norm="gGN")]
        + [AttentiveStatisticsPooling(24, 16), Conv1d(48, 8, 1, use_bias=False)])
    return encoder, masker, speaker_net


def test_streaming_tse_equals_offline(rng):
    """Full-pipeline streaming == offline inference on zero-primed input."""
    encoder, masker, speaker_net = _small_tse()
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net,
                               mask_constraint="ReLU")
    engine = StreamingTSE(encoder=encoder, masker=masker,
                          speaker_net=speaker_net, mask_constraint="ReLU")

    L = 16 * 40  # 40 frames = 4 segments
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32) * 0.1)

    params = offline.init(KEY, x, enroll, method=SoTaskWrapModule.inference)
    y_off = offline.apply(
        params, offline_equivalent_input(x, 32, 16), enroll,
        method=SoTaskWrapModule.inference)

    dvec = engine.apply(params, enroll, method=StreamingTSE.embed)
    state = engine.apply(params, 2, method=StreamingTSE.init_state)
    outs = []
    chunk = 16 * 4  # 4 frames per chunk
    for i in range(0, L, chunk):
        y, state = engine.apply(params, x[:, i:i + chunk], dvec, state,
                                method=StreamingTSE.step)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream),
                               np.asarray(y_off[:, :y_stream.shape[-1]]),
                               atol=2e-5, rtol=1e-4)


def test_streaming_tse_high_overlap_small_chunk(rng):
    """>50% encoder overlap (win - hop > chunk): the decode carry spans
    multiple future chunks, so the tail must be folded into the full OLA
    buffer before slicing (regression: the slice-then-add form shape-errors
    at win=32, hop=8, chunk=8)."""
    win, hop = 32, 8
    encoder = FreeEncDec(win_length=win, hop_length=hop, laten_length=24,
                         output_active=True)
    masker = SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                  seg_size=10, seg_overlap=False, causal=True, embed_dim=8,
                  embed_norm=True, embed_fusion="FiLM", block_with_embed=(1, 1))
    speaker_net = tuple(
        [TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
             dconv_norm="gGN")]
        + [AttentiveStatisticsPooling(24, 16), Conv1d(48, 8, 1, use_bias=False)])
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net,
                               mask_constraint="ReLU")
    engine = StreamingTSE(encoder=encoder, masker=masker,
                          speaker_net=speaker_net, mask_constraint="ReLU")

    L = hop * 40
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32) * 0.1)
    params = offline.init(KEY, x, enroll, method=SoTaskWrapModule.inference)
    y_off = offline.apply(
        params, offline_equivalent_input(x, win, hop), enroll,
        method=SoTaskWrapModule.inference)

    dvec = engine.apply(params, enroll, method=StreamingTSE.embed)
    state = engine.apply(params, 2, method=StreamingTSE.init_state)
    outs = []
    for i in range(0, L, hop):  # one-hop chunks: S=8 < win-hop=24
        y, state = engine.apply(params, x[:, i:i + hop], dvec, state,
                                method=StreamingTSE.step)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream),
                               np.asarray(y_off[:, :y_stream.shape[-1]]),
                               atol=2e-5, rtol=1e-4)


def test_streaming_batch_independence(rng):
    """Streams in a batch must not leak state into each other."""
    encoder, masker, speaker_net = _small_tse()
    engine = StreamingTSE(encoder=encoder, masker=masker,
                          speaker_net=speaker_net, mask_constraint="ReLU")
    L = 16 * 20
    x = jnp.asarray(rng.standard_normal((3, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((3, 800)).astype(np.float32) * 0.1)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net, mask_constraint="ReLU")
    params = offline.init(KEY, x, enroll, method=SoTaskWrapModule.inference)

    dvec = engine.apply(params, enroll, method=StreamingTSE.embed)

    def run(xb, db, B):
        state = engine.apply(params, B, method=StreamingTSE.init_state)
        y, _ = engine.apply(params, xb, db, state, method=StreamingTSE.step)
        return y

    y_batch = run(x, dvec, 3)
    for i in range(3):
        y_single = run(x[i:i + 1], dvec[i:i + 1], 1)
        np.testing.assert_allclose(np.asarray(y_batch[i:i + 1]),
                                   np.asarray(y_single), atol=1e-5)


def test_conv_tasnet_streaming_equals_offline(rng):
    """Causal ConvTasNet masker streaming == offline (pure-conv context)."""
    from puresound_tpu.nnet.conv_tasnet import ConvTasNet

    m = ConvTasNet(input_dim=16, embed_dim=8, embed_norm=True, tcn_kernel=3,
                   tcn_dim=12, tcn_dilated_basic=2, per_tcn_stack=3,
                   repeat_tcn=2, tcn_with_embed=(1, 0, 0), tcn_norm="cLN",
                   dconv_norm="cLN", causal=True, tcn_layer="normal")
    B, C, T = 2, 16, 48
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    p = m.init(KEY, x, e)
    y_off = m.apply(p, x, e)

    frames = jnp.swapaxes(x, 1, 2)
    state = m.apply(p, B, method=ConvTasNet.init_state)
    outs = []
    for k in range(0, T, 12):
        y, state = m.apply(p, frames[:, k:k + 12, :], e, state,
                           method=ConvTasNet.step_frames)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=2e-5, rtol=1e-4)


def test_gated_tcn_streaming_equals_offline(rng):
    """Causal GatedTCN streaming (with FiLM embed) == offline."""
    from puresound_tpu.nnet.conv_tasnet import GatedTCN

    m = GatedTCN(16, 12, kernel=3, dilation=4, emb_dim=8, causal=True,
                 tcn_norm="cLN", use_film=True)
    B, C, T = 2, 16, 40
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    p = m.init(KEY, x, e)
    y_off = m.apply(p, x, e)

    ctx = m.apply(p, B, method=GatedTCN.init_ctx)
    outs = []
    for k in range(0, T, 10):
        y, ctx = m.apply(p, x[:, :, k:k + 10], e, ctx,
                         method=GatedTCN.step_chunk)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=2e-5, rtol=1e-4)


def test_streaming_tse_conv_tasnet_engine(rng):
    """Full StreamingTSE pipeline with a causal ConvTasNet masker."""
    from puresound_tpu.nnet.conv_tasnet import ConvTasNet

    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=16,
                         output_active=False)
    masker = ConvTasNet(input_dim=16, embed_dim=8, embed_norm=True,
                        tcn_kernel=3, tcn_dim=12, tcn_dilated_basic=2,
                        per_tcn_stack=3, repeat_tcn=2,
                        tcn_with_embed=(1, 0, 0), tcn_norm="bN1d",
                        dconv_norm="bN1d", causal=True, tcn_layer="normal")
    speaker_net = tuple(
        [TCN(16, 12, 3, dilation=1, causal=False, tcn_norm="gLN",
             dconv_norm="gGN")]
        + [AttentiveStatisticsPooling(16, 8), Conv1d(32, 8, 1, use_bias=False)])
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net, mask_constraint="ReLU")
    engine = StreamingTSE(encoder=encoder, masker=masker,
                          speaker_net=speaker_net, mask_constraint="ReLU")

    L = 16 * 30
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((2, 640)).astype(np.float32) * 0.1)
    params = offline.init(KEY, x, enroll, method=SoTaskWrapModule.inference)
    y_off = offline.apply(params, offline_equivalent_input(x, 32, 16), enroll,
                          method=SoTaskWrapModule.inference)

    dvec = engine.apply(params, enroll, method=StreamingTSE.embed)
    state = engine.apply(params, 2, method=StreamingTSE.init_state)
    outs = []
    chunk = 16 * 5
    for i in range(0, L, chunk):
        y, state = engine.apply(params, x[:, i:i + chunk], dvec, state,
                                method=StreamingTSE.step)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream),
                               np.asarray(y_off[:, :y_stream.shape[-1]]),
                               atol=2e-5, rtol=1e-4)


def test_dprnn_veve_streaming_equals_offline(rng):
    """Embedding-free DPRNN (veve): enrollment conditions the initial inter
    states; streamed segments == offline, bit-identical ops."""
    from puresound_tpu.nnet.dprnn import DPRNN

    m = DPRNN(input_size=16, hidden_size=8, output_size=16, n_blocks=3,
              seg_size=5, seg_overlap=False, causal=True, embed_dim=0,
              embedding_free_tse=True)
    B, C, T = 2, 16, 40
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    x_ct = jnp.swapaxes(x, 1, 2)
    enroll = jnp.asarray(rng.standard_normal((B, 16, 17)).astype(np.float32))
    variables = m.init(KEY, x_ct, enroll)
    y_off = np.asarray(m.apply(variables, x_ct, enroll))

    state = m.apply(variables, B, method=DPRNN.init_state)
    state = m.apply(variables, state, enroll,
                    method=DPRNN.condition_stream_state)
    outs = []
    for k in range(0, T, 10):  # two segments per chunk
        y, state = m.apply(variables, x[:, k:k + 10], None, state,
                           method=DPRNN.step_frames)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(y_stream, y_off, atol=1e-6, rtol=1e-5)


def test_dprnn_film_streaming_equals_offline(rng):
    """Standard-embedding DPRNN (FiLM per block) streams too."""
    from puresound_tpu.nnet.dprnn import DPRNN

    m = DPRNN(input_size=16, hidden_size=8, output_size=16, n_blocks=2,
              seg_size=5, seg_overlap=False, causal=True, embed_dim=6,
              embed_norm=True, block_with_embed=(1, 0))
    B, C, T = 2, 16, 30
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    x_ct = jnp.swapaxes(x, 1, 2)
    dvec = jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32))
    variables = m.init(KEY, x_ct, dvec)
    y_off = np.asarray(m.apply(variables, x_ct, dvec))

    state = m.apply(variables, B, method=DPRNN.init_state)
    outs = []
    for k in range(0, T, 5):
        y, state = m.apply(variables, x[:, k:k + 5], dvec, state,
                           method=DPRNN.step_frames)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(y_stream, y_off, atol=1e-6, rtol=1e-5)


def test_streaming_tse_veve_engine(rng):
    """Full veve pipeline through StreamingTSE: embed -> conditioned state
    -> chunked steps == offline inference on the zero-primed input."""
    from puresound_tpu.nnet.dprnn import DPRNN
    from puresound_tpu.nnet.encoder import FreeEncDec

    win, hop, seg = 16, 8, 5
    encoder = FreeEncDec(win_length=win, hop_length=hop, laten_length=16,
                         output_active=True)
    masker = DPRNN(input_size=16, hidden_size=8, output_size=16, n_blocks=2,
                   seg_size=seg, seg_overlap=False, causal=True, embed_dim=0,
                   embedding_free_tse=True)
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=None, mask_constraint="ReLU",
                               embedding_free_tse=True)
    engine = StreamingTSE(encoder=encoder, masker=masker, speaker_net=None,
                          mask_constraint="ReLU")
    chunk = seg * hop
    B, L = 2, chunk * 6
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((B, chunk * 4)).astype(np.float32))
    variables = offline.init(KEY, mix, enroll,
                             method=SoTaskWrapModule.inference)

    feats = engine.apply(variables, enroll, method=StreamingTSE.embed)
    assert feats.ndim == 3  # embedding-free: features, not a vector
    state = engine.apply(variables, B, jnp.float32, feats,
                         method=StreamingTSE.init_state)
    outs = []
    for i in range(0, L, chunk):
        y, state = engine.apply(variables, mix[:, i:i + chunk], None, state,
                                method=StreamingTSE.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)

    y_off = np.asarray(offline.apply(
        variables, jnp.pad(mix, ((0, 0), (win - hop, 0))), enroll,
        method=SoTaskWrapModule.inference))[:, :L]
    np.testing.assert_allclose(y_stream, y_off, atol=1e-5, rtol=1e-4)


def test_file_eval_stream_signal_tse(rng):
    """stream_signal's time-domain branch: aligned output equals offline
    inference on the zero-primed input (delay 0 for FreeEncDec engines)."""
    from puresound_tpu.nnet.conv_tasnet import ConvTasNet
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.streaming.file_eval import stream_signal

    win, hop = 16, 8
    encoder = FreeEncDec(win_length=win, hop_length=hop, laten_length=16,
                         output_active=True)
    masker = ConvTasNet(input_dim=16, embed_dim=4, tcn_layer="normal",
                        tcn_kernel=3, tcn_dim=8, tcn_dilated_basic=2,
                        per_tcn_stack=2, repeat_tcn=1, tcn_with_embed=(1, 0),
                        tcn_norm="bN1d", dconv_norm="bN1d", causal=True)
    speaker_net = (AttentiveStatisticsPooling(16, 8),
                   Conv1d(32, 4, 1, use_bias=False))
    offline = SoTaskWrapModule(encoder=encoder, masker=masker,
                               speaker_net=speaker_net,
                               mask_constraint="ReLU")
    engine = StreamingTSE(encoder=encoder, masker=masker,
                          speaker_net=speaker_net, mask_constraint="ReLU")

    L = 1000  # not a chunk multiple
    x = rng.standard_normal(L).astype(np.float32) * 0.1
    enroll = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    variables = offline.init(KEY, jnp.asarray(x[None, :128]), enroll,
                             method=SoTaskWrapModule.inference)
    dvec = engine.apply(variables, enroll, method=StreamingTSE.embed)
    out, rtf = stream_signal(engine, variables, x, sr=16000, chunk_ms=4.0,
                             dvec=np.asarray(dvec))
    assert out.shape == (L,) and rtf > 0

    y_off = np.asarray(offline.apply(
        variables, jnp.pad(jnp.asarray(x[None]), ((0, 0), (win - hop, 0))),
        enroll, method=SoTaskWrapModule.inference))[0]
    np.testing.assert_allclose(out, y_off[:L], atol=1e-5, rtol=1e-4)
