"""Streaming server (native ring-buffer hub + serving loop) tests."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.src import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

from puresound_tpu.streaming.server import StreamHub, StreamingServer  # noqa: E402

KEY = jax.random.PRNGKey(0)


def test_hub_push_pop_roundtrip(rng):
    hub = StreamHub(2, ring_capacity=1024)
    x = rng.standard_normal(300).astype(np.float32)
    assert hub.push_input(0, x) == 300
    assert hub.input_available(0) == 300
    batch, mask, ready = hub.gather(256)
    assert ready == 1 and mask[0] and not mask[1]
    np.testing.assert_array_equal(batch[0], x[:256])
    np.testing.assert_array_equal(batch[1], 0.0)
    assert hub.input_available(0) == 44

    hub.scatter(batch, mask)
    out = hub.pop_output(0, 256)
    np.testing.assert_array_equal(out, x[:256])
    assert hub.output_available(1) == 0


def test_hub_concurrent_producers(rng):
    """8 threads feed 8 streams; every sample arrives in order."""
    hub = StreamHub(8, ring_capacity=1 << 15)
    data = [np.arange(i * 10000, i * 10000 + 5000, dtype=np.float32)
            for i in range(8)]

    def feed(sid):
        off = 0
        while off < 5000:
            n = hub.push_input(sid, data[sid][off : off + 137])
            off += n

    threads = [threading.Thread(target=feed, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        batch, mask, ready = hub.gather(5000)
        if mask[i]:
            np.testing.assert_array_equal(batch[i], data[i])
            break


def test_streaming_server_end_to_end(rng):
    """Threaded feeders -> server loop -> outputs == direct engine calls."""
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    engine = StreamingTSE(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=24,
                           output_active=True),
        masker=SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                    seg_size=10, causal=True, embed_dim=8, embed_norm=True,
                    embed_fusion="FiLM", block_with_embed=(1, 1)),
        speaker_net=(TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
                         dconv_norm="gGN"),
                     AttentiveStatisticsPooling(24, 16),
                     Conv1d(48, 8, 1, use_bias=False)),
        mask_constraint="ReLU")
    B, chunk, n_chunks = 4, 80, 6
    L = chunk * n_chunks
    x = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    enroll = jnp.asarray(rng.standard_normal((B, 400)).astype(np.float32) * 0.1)
    variables = engine.init(KEY, jnp.asarray(x[:, :chunk]), enroll,
                            method=StreamingTSE.init_all)
    dvec = engine.apply(variables, enroll, method=StreamingTSE.embed)

    # reference: direct chunked engine application
    state = engine.apply(variables, B, method=StreamingTSE.init_state)
    expect = []
    for k in range(n_chunks):
        y, state = engine.apply(variables, jnp.asarray(x[:, k * chunk:(k + 1) * chunk]),
                                dvec, state, method=StreamingTSE.step)
        expect.append(np.asarray(y))
    expect = np.concatenate(expect, axis=-1)

    # server: state carried inside the step closure
    state_box = [engine.apply(variables, B, method=StreamingTSE.init_state)]

    @jax.jit
    def raw_step(chunk_batch, st):
        return engine.apply(variables, chunk_batch, dvec, st,
                            method=StreamingTSE.step)

    def step_fn(chunk_batch):
        out, state_box[0] = raw_step(jnp.asarray(chunk_batch), state_box[0])
        return out

    server = StreamingServer(step_fn, n_streams=B, chunk_samples=chunk,
                             lockstep=True)

    def feed(sid):
        off = 0
        while off < L:
            n = server.hub.push_input(sid, x[sid, off : off + 57])
            off += n

    feeders = [threading.Thread(target=feed, args=(i,)) for i in range(B)]
    for t in feeders:
        t.start()
    server.start()
    for t in feeders:
        t.join()

    # drain: wait until every stream produced L samples
    import time

    outs = [np.zeros(0, np.float32) for _ in range(B)]
    deadline = time.time() + 30
    while time.time() < deadline and min(len(o) for o in outs) < L:
        for i in range(B):
            got = server.hub.pop_output(i, L - len(outs[i]))
            if len(got):
                outs[i] = np.concatenate([outs[i], got])
        time.sleep(0.005)
    server.stop()

    assert min(len(o) for o in outs) == L, "server did not drain all audio"
    got = np.stack(outs)
    np.testing.assert_allclose(got, expect, atol=1e-5)
