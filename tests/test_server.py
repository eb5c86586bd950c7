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


def _build_tse_engine():
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    return StreamingTSE(
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


def test_streaming_server_end_to_end(rng):
    """Threaded feeders -> server loop -> outputs == direct engine calls."""
    from puresound_tpu.streaming.engine import StreamingTSE

    engine = _build_tse_engine()
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


def test_hub_reset_stream(rng):
    hub = StreamHub(2, ring_capacity=1024)
    x = rng.standard_normal(100).astype(np.float32)
    hub.push_input(0, x)
    hub.push_input(1, x)
    batch, mask, _ = hub.gather(50)
    hub.scatter(batch, mask)
    hub.reset_stream(0)
    assert hub.input_available(0) == 0 and hub.output_available(0) == 0
    # the other slot is untouched
    assert hub.input_available(1) == 50 and hub.output_available(1) == 50
    # the slot is immediately reusable
    hub.push_input(0, x[:64])
    assert hub.input_available(0) == 64


def test_session_server_lifecycle(rng):
    """Sessions attaching/detaching mid-serving produce output identical to
    a fresh engine fed the same audio (in-jit masked state reset)."""
    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.server import SessionServer

    engine = _build_tse_engine()
    chunk, n_slots, e_len = 80, 3, 400
    mk = lambda n: rng.standard_normal(n).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(mk(chunk))[None],
                            jnp.asarray(mk(e_len))[None],
                            method=StreamingTSE.init_all)

    @jax.jit
    def embed_fn(enroll):
        return engine.apply(variables, enroll, method=StreamingTSE.embed)

    @jax.jit
    def step_fn(chunk_batch, dvec, st):
        return engine.apply(variables, chunk_batch, dvec, st,
                            method=StreamingTSE.step)

    fresh = engine.apply(variables, n_slots, method=StreamingTSE.init_state)
    server = SessionServer(step_fn, fresh, n_slots, chunk,
                           embed_fn=embed_fn, embed_dim=8, lockstep=True)

    # reference: one stream alone through a fresh batch-1 engine
    def solo(x, enroll):
        dvec = embed_fn(jnp.asarray(enroll)[None])
        st = engine.apply(variables, 1, method=StreamingTSE.init_state)
        outs = []
        for k in range(len(x) // chunk):
            y, st = step_fn(x[None, k * chunk:(k + 1) * chunk], dvec, st)
            outs.append(np.asarray(y)[0])
        return np.concatenate(outs)

    sessions = {}  # sid -> [audio, enroll, n_chunks_fed, collected_out]
    finished = []  # (audio, enroll, outs)

    def join(n_chunks):
        audio, enroll = mk(n_chunks * chunk), mk(e_len)
        sid = server.attach(enroll=enroll)
        sessions[sid] = [audio, enroll, 0, []]
        return sid

    def feed_and_tick():
        for sid, s in sessions.items():
            server.hub.push_input(sid, s[0][s[2] * chunk:(s[2] + 1) * chunk])
            s[2] += 1
        assert server.tick() > 0
        for sid in list(sessions):
            s = sessions[sid]
            got = server.hub.pop_output(sid, chunk)
            assert len(got) == chunk
            s[3].append(got)
            if s[2] * chunk >= len(s[0]):  # exhausted: retire the session
                finished.append((s[0], s[1], s[3]))
                del sessions[sid]
                server.detach(sid)

    a = join(5)
    feed_and_tick()
    feed_and_tick()
    b = join(4)                      # joins two ticks in
    assert b != a
    feed_and_tick()
    feed_and_tick()
    feed_and_tick()                  # a exhausted + auto-detached here
    c = join(3)                      # reuses a's slot
    assert c == a
    feed_and_tick()                  # b exhausted
    feed_and_tick()
    feed_and_tick()                  # c exhausted
    assert not sessions and server.n_active == 0 and len(finished) == 3
    for audio, enroll, outs in finished:
        got = np.concatenate(outs)
        assert len(got) == len(audio)
        np.testing.assert_allclose(got, solo(audio, enroll), atol=1e-5)


def test_session_server_ns_engine(rng):
    """SessionServer with an STFT engine (DPCRN, no per-slot embedding):
    the default masked reset handles the NS state layout (conv carries,
    [D, B, H] LSTM carries, shared wsum constant); a session attached
    mid-serving equals one attached from the start on the same audio."""
    import jax

    from puresound_tpu.nnet.dpcrn import DPCRN
    from puresound_tpu.nnet.encoder import ConvEncDec
    from puresound_tpu.streaming.ns_engine import StreamingNS
    from puresound_tpu.streaming.server import SessionServer

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPCRN(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                   transpose_t_size=2, transpose_delay=False,
                   kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                   dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                   stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                   delay=(0, 0, 0, 0, 0), rnn_hidden=16)
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)
    # the NS state layout is slot-visible everywhere: engine FIFOs and conv
    # carries lead with [B, ...], inter-LSTM carries are [1, B, F, H]
    # (the B*F row fold happens inside step_chunk, not in the state)
    chunk, n_slots = hop * 4, 3
    x = rng.standard_normal(chunk * 12).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(x[None, :chunk]),
                            method=StreamingNS.init_all)

    @jax.jit
    def step_fn(chunk_batch, st):
        return engine.apply(variables, chunk_batch, st,
                            method=StreamingNS.step)

    fresh = engine.apply(variables, n_slots, method=StreamingNS.init_state)
    server = SessionServer(step_fn, fresh, n_slots, chunk, lockstep=True)

    a = server.attach()
    outs, fed = {a: []}, {a: 0}

    def tick_all():
        for sid in list(outs):
            if fed[sid] * chunk < len(x):
                server.hub.push_input(
                    sid, x[fed[sid] * chunk:(fed[sid] + 1) * chunk])
                fed[sid] += 1
        server.tick()
        for sid in list(outs):
            got = server.hub.pop_output(sid, chunk)
            if len(got):
                outs[sid].append(got)

    for _ in range(4):
        tick_all()
    b = server.attach()       # joins 4 ticks in, same audio from its start
    outs[b], fed[b] = [], 0
    while min(f * chunk for f in fed.values()) < len(x):
        tick_all()
    ya, yb = np.concatenate(outs[a]), np.concatenate(outs[b])
    n = min(len(ya), len(yb))
    np.testing.assert_allclose(yb[:n], ya[:n], atol=1e-5)


def test_session_server_mesh_sharded(rng):
    """SessionServer(mesh=...) serves the slot batch SPMD over a dp mesh:
    state leaves shard on their slot axis (parallel.shard_by_slots), each
    tick's batch is row-sharded on device_put, and session lifecycle
    (attach mid-serving, masked reset, detach) behaves exactly as on one
    device — outputs match the solo batch-1 engine."""
    from puresound_tpu.parallel import make_mesh
    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.server import SessionServer

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    engine = _build_tse_engine()
    chunk, n_slots, e_len = 80, 4, 400
    mk = lambda n: rng.standard_normal(n).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(mk(chunk))[None],
                            jnp.asarray(mk(e_len))[None],
                            method=StreamingTSE.init_all)

    @jax.jit
    def embed_fn(enroll):
        return engine.apply(variables, enroll, method=StreamingTSE.embed)

    @jax.jit
    def step_fn(chunk_batch, dvec, st):
        return engine.apply(variables, chunk_batch, dvec, st,
                            method=StreamingTSE.step)

    mesh = make_mesh(n_dp=2, devices=jax.devices()[:2])
    fresh = engine.apply(variables, n_slots, method=StreamingTSE.init_state)
    server = SessionServer(step_fn, fresh, n_slots, chunk,
                           embed_fn=embed_fn, embed_dim=8, lockstep=True,
                           mesh=mesh)
    # the engine state really is spread over both devices
    n_devs = {len(l.sharding.device_set)
              for l in jax.tree_util.tree_leaves(server._state)
              if hasattr(l, "sharding") and n_slots in l.shape}
    assert 2 in n_devs, f"no state leaf sharded over the mesh ({n_devs})"

    def solo(x, enroll):
        dvec = embed_fn(jnp.asarray(enroll)[None])
        st = engine.apply(variables, 1, method=StreamingTSE.init_state)
        outs = []
        for k in range(len(x) // chunk):
            y, st = step_fn(x[None, k * chunk:(k + 1) * chunk], dvec, st)
            outs.append(np.asarray(y)[0])
        return np.concatenate(outs)

    audio = {s: mk(6 * chunk) for s in ("a", "b")}
    enr = {s: mk(e_len) for s in audio}
    sid, outs, fed = {}, {"a": [], "b": []}, {"a": 0, "b": 0}

    def tick_active():
        for s in sid:
            server.hub.push_input(
                sid[s], audio[s][fed[s] * chunk:(fed[s] + 1) * chunk])
            fed[s] += 1
        assert server.tick() > 0
        for s in list(sid):
            got = server.hub.pop_output(sid[s], chunk)
            assert len(got) == chunk
            outs[s].append(got)
            if fed[s] * chunk >= len(audio[s]):  # exhausted: retire
                server.detach(sid.pop(s))

    sid["a"] = server.attach(enroll=enr["a"])
    tick_active()
    tick_active()
    sid["b"] = server.attach(enroll=enr["b"])  # joins two ticks in
    while sid:
        tick_active()
    assert server.n_active == 0
    snap = server.stats.snapshot()
    assert snap["ticks"] == server.ticks > 0
    assert snap["tick_ms_p50"] > 0.0 and snap["underrun_slot_ticks"] == 0
    for s in ("a", "b"):
        got = np.concatenate(outs[s])
        assert len(got) == len(audio[s])
        np.testing.assert_allclose(got, solo(audio[s], enr[s]), atol=1e-5)


def test_session_server_pipelined(rng):
    """pipelined=True double-buffers the output: values identical to the
    unpipelined server, delivered one tick later (flush() drains the last);
    and a slot recycled between a tick's dispatch and its scatter must NOT
    receive the old session's output (per-slot generation guard)."""
    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.server import SessionServer

    engine = _build_tse_engine()
    chunk, n_slots, e_len = 80, 3, 400
    mk = lambda n: rng.standard_normal(n).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(mk(chunk))[None],
                            jnp.asarray(mk(e_len))[None],
                            method=StreamingTSE.init_all)

    @jax.jit
    def embed_fn(enroll):
        return engine.apply(variables, enroll, method=StreamingTSE.embed)

    @jax.jit
    def step_fn(chunk_batch, dvec, st):
        return engine.apply(variables, chunk_batch, dvec, st,
                            method=StreamingTSE.step)

    fresh = engine.apply(variables, n_slots, method=StreamingTSE.init_state)
    server = SessionServer(step_fn, fresh, n_slots, chunk,
                           embed_fn=embed_fn, embed_dim=8, lockstep=True,
                           pipelined=True)

    def solo(x, enroll):
        dvec = embed_fn(jnp.asarray(enroll)[None])
        st = engine.apply(variables, 1, method=StreamingTSE.init_state)
        outs = []
        for k in range(len(x) // chunk):
            y, st = step_fn(x[None, k * chunk:(k + 1) * chunk], dvec, st)
            outs.append(np.asarray(y)[0])
        return np.concatenate(outs)

    audio, enroll = mk(4 * chunk), mk(e_len)
    a = server.attach(enroll=enroll)
    outs = []
    for k in range(4):
        server.hub.push_input(a, audio[k * chunk:(k + 1) * chunk])
        n = server.tick()
        assert n == (0 if k == 0 else 1)  # output lags one tick
        got = server.hub.pop_output(a, chunk)
        if len(got):
            outs.append(got)
    assert server.flush() == 1
    outs.append(server.hub.pop_output(a, chunk))
    got = np.concatenate(outs)
    assert len(got) == len(audio)
    np.testing.assert_allclose(got, solo(audio, enroll), atol=1e-5)
    server.detach(a)

    # --- slot recycle between dispatch and scatter --------------------------
    b = server.attach(enroll=mk(e_len))
    server.hub.push_input(b, mk(chunk))
    assert server.tick() == 0        # b's output is now in flight
    server.detach(b)
    c = server.attach(enroll=enroll)  # reuses b's slot, generation bumped
    assert c == b
    c_audio = mk(chunk)
    server.hub.push_input(c, c_audio)
    n = server.tick()                # scatters b's in-flight: must suppress
    assert n == 0
    assert server.hub.output_available(c) == 0, "old session's output leaked"
    assert server.flush() == 1       # c's own first chunk arrives
    got_c = server.hub.pop_output(c, chunk)
    np.testing.assert_allclose(got_c, solo(c_audio, enroll)[:chunk],
                               atol=1e-5)


def test_infer_slot_axes_and_axes_reset():
    """infer_slot_axes diffs init_state at two slot counts to find each
    leaf's exact slot axis (folded B*F axes and shared clocks included);
    _axes_state_reset applies the mask on exactly that axis — immune to
    the size-coincidence that can fool the default heuristic."""
    from puresound_tpu.streaming.server import (_axes_state_reset,
                                                _masked_state_reset,
                                                infer_slot_axes)

    init = lambda b: {
        "x": jnp.zeros((b, 4)),
        "carry": jnp.zeros((2, b, 3)),      # leading D=2 (ambiguous at B=2)
        "folded": jnp.zeros((1, b * 5, 3)),  # slot-major B*F fold
        "clock": jnp.zeros(()),              # shared scalar
    }
    axes = infer_slot_axes(init)
    assert axes == {"x": 0, "carry": 1, "folded": 1, "clock": -1}

    B = 2  # collides with the D=2 axis of "carry"
    state = init(B)
    fresh = jax.tree.map(jnp.ones_like, state)
    mask = jnp.asarray(np.array([True, False]))
    got = _axes_state_reset(axes)(state, fresh, mask)
    np.testing.assert_array_equal(np.asarray(got["x"]),
                                  np.stack([np.ones(4), np.zeros(4)]))
    # slot axis is axis 1: slot 0 rows reset across BOTH directions
    np.testing.assert_array_equal(np.asarray(got["carry"][:, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(got["carry"][:, 1]), 0.0)
    # folded axis: the first 5 rows belong to slot 0
    np.testing.assert_array_equal(np.asarray(got["folded"][0, :5]), 1.0)
    np.testing.assert_array_equal(np.asarray(got["folded"][0, 5:]), 0.0)
    # shared clock resets only when all slots reset
    assert float(got["clock"]) == 0.0
    got_all = _axes_state_reset(axes)(state, fresh,
                                      jnp.asarray(np.array([True, True])))
    assert float(got_all["clock"]) == 1.0

    # the default heuristic picks carry's D axis (first size match) — the
    # very ambiguity infer_slot_axes exists to remove
    bad = _masked_state_reset(state, fresh, mask)
    assert np.asarray(bad["carry"])[0].all() == 1.0  # reset along D: wrong


def test_session_server_ns_engine_two_slots_explicit_axes(rng):
    """n_slots=2 NS serving with slot_axes=infer_slot_axes(...): a session
    attached mid-serving matches a fresh engine exactly even when slot
    count collides with a state dimension (the default size heuristic is
    known to mis-reset at n_slots=2 on this layout)."""
    from puresound_tpu.nnet.dpcrn import DPCRN
    from puresound_tpu.nnet.encoder import ConvEncDec
    from puresound_tpu.streaming.ns_engine import StreamingNS
    from puresound_tpu.streaming.server import SessionServer, infer_slot_axes

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPCRN(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                   transpose_t_size=2, transpose_delay=False,
                   kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                   dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                   stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                   delay=(0, 0, 0, 0, 0), rnn_hidden=16)
    engine = StreamingNS(encoder=encoder, masker=masker,
                         mask_constraint="linear", drop_first_bin=True)
    chunk, n_slots = hop * 4, 2
    x = rng.standard_normal(chunk * 10).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(x[None, :chunk]),
                            method=StreamingNS.init_all)

    @jax.jit
    def step_fn(chunk_batch, st):
        return engine.apply(variables, chunk_batch, st,
                            method=StreamingNS.step)

    init_state = lambda b: engine.apply(variables, b,
                                        method=StreamingNS.init_state)
    server = SessionServer(step_fn, init_state(n_slots), n_slots, chunk,
                           lockstep=True,
                           slot_axes=infer_slot_axes(init_state))

    a = server.attach()
    outs, fed = {a: []}, {a: 0}

    def tick_all():
        for sid in list(outs):
            if fed[sid] * chunk < len(x):
                server.hub.push_input(
                    sid, x[fed[sid] * chunk:(fed[sid] + 1) * chunk])
                fed[sid] += 1
        server.tick()
        for sid in list(outs):
            got = server.hub.pop_output(sid, chunk)
            if len(got):
                outs[sid].append(got)

    for _ in range(3):
        tick_all()
    b = server.attach()  # joins 3 ticks in, same audio from its start
    outs[b], fed[b] = [], 0
    while min(f * chunk for f in fed.values()) < len(x):
        tick_all()
    ya, yb = np.concatenate(outs[a]), np.concatenate(outs[b])
    n = min(len(ya), len(yb))
    np.testing.assert_allclose(yb[:n], ya[:n], atol=1e-6, rtol=1e-6)


def test_socket_serving_front(rng):
    """TCP front-end: concurrent remote sessions produce output identical
    to a fresh solo engine; slot exhaustion and bad HELLOs surface as
    client-side errors; partial trailing chunks are dropped per contract."""
    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.server import SessionServer
    from puresound_tpu.streaming.socket_server import (SocketServingFront,
                                                       StreamingClient)

    engine = _build_tse_engine()
    chunk, n_slots, e_len = 80, 2, 400
    mk = lambda n: rng.standard_normal(n).astype(np.float32) * 0.1
    variables = engine.init(KEY, jnp.asarray(mk(chunk))[None],
                            jnp.asarray(mk(e_len))[None],
                            method=StreamingTSE.init_all)

    @jax.jit
    def embed_fn(enroll):
        return engine.apply(variables, enroll, method=StreamingTSE.embed)

    @jax.jit
    def step_fn(chunk_batch, dvec, st):
        return engine.apply(variables, chunk_batch, dvec, st,
                            method=StreamingTSE.step)

    fresh = engine.apply(variables, n_slots, method=StreamingTSE.init_state)
    server = SessionServer(step_fn, fresh, n_slots, chunk,
                           embed_fn=embed_fn, embed_dim=8)
    front = SocketServingFront(server).start()
    host, port = front.address
    try:
        def solo(x, enroll):
            dvec = embed_fn(jnp.asarray(enroll)[None])
            st = engine.apply(variables, 1, method=StreamingTSE.init_state)
            outs = []
            for k in range(len(x) // chunk):
                y, st = step_fn(x[None, k * chunk:(k + 1) * chunk], dvec, st)
                outs.append(np.asarray(y)[0])
            return np.concatenate(outs)

        def run_client(audio, enroll, got):
            c = StreamingClient(host, port).hello(enroll)
            assert c.chunk == chunk
            for k in range(0, len(audio), 130):  # chunk-misaligned sends
                c.send(audio[k:k + 130])
            got.append(c.recv_available(wait_s=0.05))
            got.append(c.finish())

        # two concurrent sessions, one with a partial trailing chunk
        cases = [(mk(5 * chunk + 17), mk(e_len)), (mk(4 * chunk), mk(e_len))]
        got = [[], []]
        threads = [threading.Thread(target=run_client,
                                    args=(a, e, got[i]))
                   for i, (a, e) in enumerate(cases)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60.0)
            assert not t.is_alive()
        for (audio, enroll), g in zip(cases, got):
            out = np.concatenate(g)
            n = (len(audio) // chunk) * chunk  # partial tail never ticks
            assert len(out) == n
            np.testing.assert_allclose(out, solo(audio[:n], enroll),
                                       atol=1e-5)
        assert server.n_active == 0  # every session detached after BYE

        # TSE HELLO without an enrollment payload is refused
        with pytest.raises(RuntimeError, match="HELLO payload"):
            StreamingClient(host, port).hello()

        # slot exhaustion surfaces as a client-side error
        dv = np.asarray(embed_fn(jnp.asarray(mk(e_len))[None]))[0]
        c1 = StreamingClient(host, port).hello(dv)
        c2 = StreamingClient(host, port).hello(dv)
        with pytest.raises(RuntimeError, match="free stream slots"):
            StreamingClient(host, port).hello(dv)
        assert c1.finish().size == 0 and c2.finish().size == 0
    finally:
        front.stop()


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_session_server_tick_failure_surfaces(rng):
    """A step_fn that dies must not leave a zombie server: the serve loop
    records the failure, stops, and attach() raises instead of ACKing
    slots that will never tick (review: silent daemon-thread death)."""
    import time

    from puresound_tpu.streaming.server import SessionServer

    chunk, n_slots = 64, 2

    def step_fn(batch, st):
        raise ValueError("kernel exploded")

    fresh = {"carry": jnp.zeros((n_slots, 4))}
    server = SessionServer(step_fn, fresh, n_slots, chunk)
    server.start()
    try:
        sid = server.attach()
        server.hub.push_input(sid, rng.standard_normal(chunk).astype(np.float32))
        deadline = time.monotonic() + 10.0
        while server.failure is None and time.monotonic() < deadline:
            time.sleep(0.01)
        assert isinstance(server.failure, ValueError)
        with pytest.raises(RuntimeError, match="serving loop died"):
            server.attach()
    finally:
        server.stop()


def test_session_server_output_overflow_counted(rng):
    """A client that never drains its output ring loses samples in
    hub_scatter; the hub counts them (the socket front turns a nonzero
    count into an ERROR instead of silently-short output)."""
    from puresound_tpu.streaming.deploy import make_session_server

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule

    from tests.test_deploy import _ns_model

    model = _ns_model()
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)
    # hop=32 -> chunk_ms=8 @ 16 kHz = 128 samples; ring holds 256
    bundle = make_session_server(model, variables, n_slots=1, chunk_ms=8.0,
                                 sr=16000, ring_capacity=256)
    server, chunk = bundle.server, bundle.chunk_samples
    sid = server.attach()
    try:
        for _ in range(6):  # 6 chunks in, 0 drained: ring fits only 2
            server.hub.push_input(
                sid, rng.standard_normal(chunk).astype(np.float32))
            server.tick()
        dropped = server.hub.output_dropped(sid)
        assert dropped >= chunk, dropped
        assert server.hub.output_available(sid) <= 256
        # slot reuse clears the counter
        server.detach(sid)
        sid2 = server.attach()
        assert server.hub.output_dropped(sid2) == 0
    finally:
        server.stop() if server._thread is not None else None
