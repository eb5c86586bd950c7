"""Serving deployment builder (streaming/deploy.py): model -> SessionServer
-> TCP front-end, with output equivalence against the bare engine."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.nnet.conv_tasnet import TCN
from puresound_tpu.nnet.dpcrn import DPCRN
from puresound_tpu.nnet.encoder import ConvEncDec, FreeEncDec
from puresound_tpu.nnet.lobe.cnn import Conv1d
from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
from puresound_tpu.nnet.skim import SkiM
from puresound_tpu.src import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

KEY = jax.random.PRNGKey(0)


def _tse_model():
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
    model = SoTaskWrapModule(encoder=encoder, masker=masker,
                             speaker_net=speaker_net, mask_constraint="ReLU")
    return model


def _ns_model(n_fft=128, hop=32):
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPCRN(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                   transpose_t_size=2, transpose_delay=False,
                   kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                   dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                   stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                   delay=(0, 0, 0, 0, 0), rnn_hidden=16)
    return SoTaskWrapModule(encoder=encoder, masker=masker,
                            drop_first_bin=True, mask_constraint="linear",
                            f_type="Complex", mask_type="Complex")


def test_make_session_server_tse_matches_engine(rng):
    """Deploy-built server output == the bare engine stepped solo."""
    from puresound_tpu.streaming.deploy import make_session_server
    from puresound_tpu.streaming.engine import StreamingTSE

    model = _tse_model()
    sr = 16000
    x0 = jnp.asarray(rng.standard_normal((1, 320)).astype(np.float32) * 0.1)
    e0 = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, e0, method=SoTaskWrapModule.inference)

    # hop=16, seg_size=10 -> 160-sample chunks cover whole segments
    bundle = make_session_server(model, variables, n_slots=2, chunk_ms=10.0,
                                 sr=sr, enroll_len=800)
    assert bundle.chunk_samples == 160 and bundle.embed_dim == 8
    server = bundle.server

    audio = rng.standard_normal(3 * 160).astype(np.float32) * 0.1
    enroll = rng.standard_normal(800).astype(np.float32) * 0.1
    sid = server.attach(enroll=enroll)
    outs = []
    for k in range(3):
        server.hub.push_input(sid, audio[k * 160:(k + 1) * 160])
        assert server.tick() == 1
        outs.append(server.hub.pop_output(sid, 160))
    got = np.concatenate(outs)

    engine = bundle.engine
    dvec = bundle.embed_fn(jnp.asarray(enroll)[None])
    st = engine.apply(variables, 1, method=StreamingTSE.init_state)
    ref = []
    for k in range(3):
        y, st = engine.apply(variables,
                             jnp.asarray(audio[None, k * 160:(k + 1) * 160]),
                             dvec, st, method=StreamingTSE.step)
        ref.append(np.asarray(y)[0])
    np.testing.assert_allclose(got, np.concatenate(ref), atol=1e-5)


def test_make_session_server_ns_and_socket_serve(rng):
    """NS deploy path end-to-end over the TCP front-end (run_serve)."""
    from puresound_tpu.streaming.deploy import run_serve
    from puresound_tpu.streaming.ns_engine import StreamingNS
    from puresound_tpu.streaming.socket_server import StreamingClient

    model = _ns_model()
    sr = 16000
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)

    started = {}
    ready = threading.Event()
    stop = threading.Event()

    def on_started(front, bundle):
        started["addr"] = front.address
        started["bundle"] = bundle
        ready.set()

    th = threading.Thread(
        target=run_serve,
        args=(model, variables, 2),
        kwargs=dict(host="127.0.0.1", port=0, stop_event=stop,
                    on_started=on_started, chunk_ms=8.0, sr=sr),
        daemon=True)
    th.start()
    assert ready.wait(timeout=60.0)
    try:
        bundle = started["bundle"]
        chunk = bundle.chunk_samples
        assert chunk == 128  # 8 ms @ 16 kHz, hop 32
        audio = rng.standard_normal(4 * chunk).astype(np.float32) * 0.1

        c = StreamingClient(*started["addr"]).hello()  # NS: empty HELLO
        assert c.chunk == chunk
        c.send(audio)
        got = c.finish()
        assert got.shape == (4 * chunk,)

        engine = bundle.engine
        st = engine.apply(variables, 1, method=StreamingNS.init_state)
        ref = []
        for k in range(4):
            y, st = engine.apply(
                variables, jnp.asarray(audio[None, k * chunk:(k + 1) * chunk]),
                st, method=StreamingNS.step)
            ref.append(np.asarray(y)[0])
        np.testing.assert_allclose(got, np.concatenate(ref), atol=1e-5)
    finally:
        stop.set()
        th.join(timeout=30.0)
        assert not th.is_alive()


def test_make_session_server_validation(rng):
    """Flag/engine mismatches fail fast with clear errors."""
    from puresound_tpu.streaming.deploy import make_session_server

    model = _tse_model()
    x0 = jnp.asarray(rng.standard_normal((1, 320)).astype(np.float32) * 0.1)
    e0 = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, e0, method=SoTaskWrapModule.inference)

    with pytest.raises(ValueError, match="STFT-domain"):
        make_session_server(model, variables, n_slots=2, dp_kernel=True)
    with pytest.raises(ValueError, match="multiple of b_tile"):
        make_session_server(model, variables, n_slots=3, fused=True,
                            b_tile=2)
    with pytest.warns(UserWarning, match="segment"):
        # 4-frame chunks don't cover the 10-frame SkiM segments
        make_session_server(model, variables, n_slots=2, chunk_ms=4.0)


def test_make_session_server_simo_socket(rng):
    """SIMO (DSS) serving: M sources ride the single ring sample-interleaved
    and the client de-interleaves to [M, T] matching the bare engine."""
    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.nnet.dparn import DPARN_Mout
    from puresound_tpu.streaming.deploy import make_session_server
    from puresound_tpu.streaming.simo_engine import StreamingDSS
    from puresound_tpu.streaming.socket_server import (SocketServingFront,
                                                       StreamingClient)

    n_fft, hop, sr = 128, 32, 16000
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPARN_Mout(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                        dropout=0.0, channels=(1, 8, 8), transpose_t_size=2,
                        transpose_delay=False, kernel_t=(2, 2),
                        stride_t=(1, 1), dilation_t=(1, 1), kernel_f=(5, 3),
                        stride_f=(2, 2), dilation_f=(1, 1), delay=(0, 0),
                        multi_output=2, rnn_hidden=8, nhead=2)
    model = SiMoTaskWrapModule(encoder=encoder, masker=masker,
                               f_type="Complex", mask_type="Complex",
                               drop_first_bin=True, mask_constraint="linear")
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SiMoTaskWrapModule.inference)

    bundle = make_session_server(model, variables, n_slots=2, chunk_ms=8.0,
                                 sr=sr)
    assert bundle.n_sources == 2 and bundle.embed_fn is None
    chunk = bundle.chunk_samples
    front = SocketServingFront(bundle.server,
                               n_sources=bundle.n_sources).start()
    try:
        audio = rng.standard_normal(3 * chunk).astype(np.float32) * 0.1
        c = StreamingClient(*front.address).hello()
        assert c.n_sources == 2
        c.send(audio)
        got = c.finish()
        assert got.shape == (2, 3 * chunk)

        engine = bundle.engine
        st = engine.apply(variables, 1, method=StreamingDSS.init_state)
        ref = []
        for k in range(3):
            y, st = engine.apply(
                variables, jnp.asarray(audio[None, k * chunk:(k + 1) * chunk]),
                st, method=StreamingDSS.step)
            ref.append(np.asarray(y)[0])  # [M, S]
        np.testing.assert_allclose(got, np.concatenate(ref, axis=-1),
                                   atol=1e-5)
    finally:
        front.stop()


def test_socket_serving_churn(rng):
    """Stress: many short sessions churning over 2 slots, some disconnecting
    abruptly (no BYE) — outputs stay correct, slots recycle, server stays
    healthy."""
    import socket as socket_mod
    import time

    from puresound_tpu.streaming.deploy import make_session_server
    from puresound_tpu.streaming.ns_engine import StreamingNS
    from puresound_tpu.streaming.socket_server import (SocketServingFront,
                                                       StreamingClient)

    model = _ns_model()
    sr = 16000
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)
    bundle = make_session_server(model, variables, n_slots=2, chunk_ms=8.0,
                                 sr=sr)
    chunk = bundle.chunk_samples
    front = SocketServingFront(bundle.server).start()
    host, port = front.address

    # solo reference for value checks
    engine = bundle.engine

    def solo(audio):
        st = engine.apply(variables, 1, method=StreamingNS.init_state)
        outs = []
        for k in range(len(audio) // chunk):
            y, st = engine.apply(
                variables, jnp.asarray(audio[None, k * chunk:(k + 1) * chunk]),
                st, method=StreamingNS.step)
            outs.append(np.asarray(y)[0])
        return np.concatenate(outs)

    errors = []

    def worker(widx):
        wrng = np.random.default_rng(1000 + widx)
        for r in range(4):
            audio = (wrng.standard_normal(chunk * int(wrng.integers(1, 4)))
                     .astype(np.float32) * 0.1)
            # retry attach: only 2 slots for 4 workers
            for _ in range(400):
                try:
                    c = StreamingClient(host, port).hello()
                    break
                except RuntimeError:
                    time.sleep(0.02)
            else:
                errors.append((widx, r, "never got a slot"))
                return
            try:
                c.send(audio)
                if (widx + r) % 3 == 0:
                    # abrupt disconnect mid-session: no BYE, no drain
                    c._sock.close()
                    continue
                got = c.finish()
                ref = solo(audio)
                if got.shape != ref.shape:
                    errors.append((widx, r, f"shape {got.shape}"))
                elif not np.allclose(got, ref, atol=1e-5):
                    errors.append((widx, r, "value mismatch"))
            except Exception as e:  # noqa: BLE001 — collect, don't die
                errors.append((widx, r, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120.0)
        assert not t.is_alive()
    assert not errors, errors

    # abrupt disconnects must have freed their slots
    deadline = time.monotonic() + 10.0
    while bundle.server.n_active and time.monotonic() < deadline:
        time.sleep(0.05)
    assert bundle.server.n_active == 0

    # the server still serves a fresh, correct session after the churn
    audio = rng.standard_normal(2 * chunk).astype(np.float32) * 0.1
    c = StreamingClient(host, port).hello()
    c.send(audio)
    np.testing.assert_allclose(c.finish(), solo(audio), atol=1e-5)
    front.stop()


def test_socket_client_send_chunks_at_max_payload(rng, monkeypatch):
    """StreamingClient.send splits one big buffer into MAX_PAYLOAD-sized
    AUDIO messages (the server caps per-message allocations; a long eval
    recording pushed in one call must still round-trip, not kill the
    session)."""
    from puresound_tpu.streaming import socket_server as ss
    from puresound_tpu.streaming.deploy import make_session_server

    model = _ns_model()
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)
    bundle = make_session_server(model, variables, n_slots=1, chunk_ms=8.0,
                                 sr=16000)
    chunk = bundle.chunk_samples
    front = ss.SocketServingFront(bundle.server).start()
    try:
        audio = rng.standard_normal(6 * chunk).astype(np.float32) * 0.1

        # reference: normal-sized sends
        c = ss.StreamingClient(*front.address).hello()
        c.send(audio)
        ref = c.finish()

        # one send() of the whole buffer under a tiny cap -> many messages
        monkeypatch.setattr(ss, "MAX_PAYLOAD", chunk * 4)  # bytes; < buffer
        c2 = ss.StreamingClient(*front.address).hello()
        c2.send(audio)  # 6*chunk*4 bytes >> cap: must split, not die
        got = c2.finish()
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        front.stop()


def test_socket_server_audio_out_capped_deterministic(rng, monkeypatch):
    """Server-side AUDIO_OUT cap, deterministically: gate the pump's view
    of the output ring to 0 until ALL chunks have been served into the
    ring, so output_available > cap is guaranteed (not timing-dependent),
    then release and assert every AUDIO_OUT payload <= MAX_PAYLOAD."""
    import threading as _threading

    from puresound_tpu.streaming import socket_server as ss
    from puresound_tpu.streaming.deploy import make_session_server

    model = _ns_model()
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)
    bundle = make_session_server(model, variables, n_slots=1, chunk_ms=8.0,
                                 sr=16000)
    chunk = bundle.chunk_samples
    n_chunks = 6
    # cap = exactly one chunk of samples per message
    monkeypatch.setattr(ss, "MAX_PAYLOAD", chunk * 4)

    real_hub = bundle.server.hub
    gate = _threading.Event()  # closed: pump sees an empty ring

    class GatedHub:
        def output_available(self, sid):
            return real_hub.output_available(sid) if gate.is_set() else 0

        def __getattr__(self, name):
            return getattr(real_hub, name)

    monkeypatch.setattr(bundle.server, "hub", GatedHub())

    sent = []  # (msg_type, payload_bytes) from the server side
    orig_send = ss._send_msg

    def recording_send(sock, t, payload=b""):
        sent.append((t, len(payload)))
        return orig_send(sock, t, payload)

    monkeypatch.setattr(ss, "_send_msg", recording_send)

    front = ss.SocketServingFront(bundle.server).start()
    try:
        audio = rng.standard_normal(n_chunks * chunk).astype(np.float32) * 0.1
        c = ss.StreamingClient(*front.address).hello()
        c.send(audio)
        # wait (on the REAL hub) until every chunk's output is in the ring
        deadline = time.monotonic() + 30.0
        want = n_chunks * chunk
        while (real_hub.output_available(c.slot) < want
               and time.monotonic() < deadline):
            time.sleep(0.01)
        assert real_hub.output_available(c.slot) >= want, (
            "serving loop never filled the ring")
        gate.set()  # release: the pump now sees 6*chunk > cap at once
        got = c.finish()
        assert got.size == want
        outs = [n for t, n in sent if t == ss.MSG_AUDIO_OUT]
        assert len(outs) >= n_chunks  # the coalesced ring WAS split
        assert max(outs) <= ss.MAX_PAYLOAD, outs
    finally:
        front.stop()


def test_socket_front_survives_protocol_garbage(rng):
    """Malformed clients (wrong first message, oversized length header,
    never-HELLO, truncated header then disconnect) must never wedge the
    front-end — a well-behaved session afterwards still works."""
    import socket as pysocket
    import struct as pystruct

    from puresound_tpu.streaming import socket_server as ss
    from puresound_tpu.streaming.deploy import make_session_server

    model = _ns_model()
    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)
    bundle = make_session_server(model, variables, n_slots=1, chunk_ms=8.0,
                                 sr=16000)
    front = ss.SocketServingFront(bundle.server,
                                  hello_timeout_s=0.5).start()
    host, port = front.address
    try:
        # (a) wrong first message type -> MSG_ERROR reply, clean close
        s = pysocket.create_connection((host, port), timeout=5.0)
        s.sendall(pystruct.pack("<II", ss.MSG_AUDIO, 4) + b"\x00" * 4)
        hdr = ss._recv_exact(s, 8)  # bare recv may legally short-read
        t, n = pystruct.unpack("<II", hdr)
        assert t == ss.MSG_ERROR
        s.close()

        # (b) oversized length header -> connection dropped, no huge alloc
        s = pysocket.create_connection((host, port), timeout=5.0)
        s.sendall(pystruct.pack("<II", ss.MSG_HELLO, 0xFFFFFFFF))
        assert s.recv(8) == b""  # server closed on us
        s.close()

        # (c) connect and say nothing -> dropped after hello_timeout_s
        s = pysocket.create_connection((host, port), timeout=5.0)
        s.settimeout(5.0)
        assert s.recv(8) == b""  # server gave up waiting for HELLO
        s.close()

        # (d) truncated header then abrupt close
        s = pysocket.create_connection((host, port), timeout=5.0)
        s.sendall(b"\x01\x00")
        s.close()

        # (e) byte-trickling HELLO: each recv succeeds inside the timeout
        # window but the message never completes — the DEADLINE (not a
        # per-recv timeout) must still drop the connection
        import time as pytime

        s = pysocket.create_connection((host, port), timeout=5.0)
        s.settimeout(5.0)
        s.sendall(pystruct.pack("<II", ss.MSG_HELLO, 64))
        t0 = pytime.monotonic()
        try:
            for _ in range(20):  # 0.2 s apart < hello_timeout_s=0.5
                pytime.sleep(0.2)
                s.sendall(b"\x00")
        except OSError:
            pass  # server dropped us mid-trickle
        try:
            assert s.recv(8) == b""  # dropped (EOF or RST)
        except OSError:
            pass
        assert pytime.monotonic() - t0 < 4.0  # well before 20*0.2 s
        s.close()

        # no slot was ever consumed, and a real session still works
        assert bundle.server.n_active == 0
        audio = rng.standard_normal(2 * bundle.chunk_samples).astype(
            np.float32) * 0.1
        c = ss.StreamingClient(host, port).hello()
        c.send(audio)
        out = c.finish()
        assert out.shape == audio.shape and np.isfinite(out).all()
    finally:
        front.stop()


def test_make_session_server_rejects_embedding_free_tse(rng):
    """Embedding-free TSE conditions the masker's INITIAL recurrent state
    (zoo veve_dprnn_v0_causal) — per-slot sessions can't express that, and
    without the guard the serving thread would die with a TypeError on its
    first tick (review finding)."""
    from puresound_tpu.nnet.dprnn import DPRNN
    from puresound_tpu.streaming.deploy import make_session_server

    model = SoTaskWrapModule(
        encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=16,
                           output_active=True),
        masker=DPRNN(input_size=16, hidden_size=8, output_size=16,
                     n_blocks=2, seg_size=10, seg_overlap=False, causal=True,
                     embed_dim=0, embed_norm=False, block_with_embed=(0, 0),
                     embedding_free_tse=True),
        speaker_net=None, mask_constraint="ReLU", embedding_free_tse=True)
    x = jnp.asarray(rng.standard_normal((1, 320)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, x, method=SoTaskWrapModule.inference)
    with pytest.raises(ValueError, match="embedding-free"):
        make_session_server(model, variables, n_slots=2, chunk_ms=10.0,
                            sr=16000)


def test_make_session_server_pcm16_matches_float(rng):
    """pcm16=True (int16 host<->device payloads, round-5 serving-transfer
    lever) must match the float32 server to the 16-bit PCM quantization
    floor, through attach/tick/pop on the real rings."""
    from puresound_tpu.streaming.deploy import make_session_server

    model = _tse_model()
    x0 = jnp.asarray(rng.standard_normal((1, 320)).astype(np.float32) * 0.1)
    e0 = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x0, e0, method=SoTaskWrapModule.inference)

    audio = rng.standard_normal(3 * 160).astype(np.float32) * 0.1
    enroll = rng.standard_normal(800).astype(np.float32) * 0.1

    def run(pcm16):
        bundle = make_session_server(model, variables, n_slots=2,
                                     chunk_ms=10.0, sr=16000,
                                     enroll_len=800, pcm16=pcm16)
        sid = bundle.server.attach(enroll=enroll)
        outs = []
        for k in range(3):
            bundle.server.hub.push_input(sid, audio[k * 160:(k + 1) * 160])
            assert bundle.server.tick() == 1
            outs.append(bundle.server.hub.pop_output(sid, 160))
        return np.concatenate(outs)

    got16 = run(True)
    got32 = run(False)
    err = got16 - got32
    # the gate is ABSOLUTE: a few LSB at scale 8192 (one LSB ~1.2e-4).
    # A relative SNR would understate fidelity here only because the
    # untrained model's output is tiny (~1e-3 rms); at speech levels the
    # same absolute floor is ~69 dB SNR.
    assert np.abs(err).max() < 8e-4, np.abs(err).max()
    assert np.sqrt((err ** 2).mean()) < 2e-4, np.sqrt((err ** 2).mean())
