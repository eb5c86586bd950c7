"""Live streaming TSE demo: simulated microphones -> serving loop -> sinks.

The reference demo (egs/tse/demo/demo_app.py:19-339) is a tkinter app with
a mic-record thread and a model-inference thread sharing unlocked Python
lists. This environment has no audio hardware or display, so this demo
reproduces the LIVE topology with simulated microphones:

    N mic threads (real-time cadence, 1 wav each)
        └─push─▶ C++ lock-free ring-buffer hub (csrc/stream_runtime.cpp)
    serving thread: StreamingServer.tick — one jitted batched chunk step
        └─pop──▶ N sink threads (enhanced audio + per-chunk latency)

Run (defaults stream the bundled test_case wav as every "mic"):

  python live_demo.py --enroll /root/reference/test/test_case/1272-141231-0008.flac \
      --input /root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav \
      --n-mics 4 --seconds 6 --out-dir /tmp/live_demo

Prints live per-tick stats and, at the end, per-stream latency percentiles
and real-time margin; writes each stream's enhanced wav.
"""
import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from demo_app import build_flagship_engine  # noqa: E402


class SimulatedMicrophone(threading.Thread):
    """Pushes a waveform into the hub in chunk-sized pieces at real-time
    cadence (the record thread of the reference demo, demo_app.py:285-310,
    without hardware)."""

    def __init__(self, hub, stream_id: int, wav: np.ndarray, sr: int,
                 chunk: int, realtime: bool = True):
        super().__init__(daemon=True)
        self.hub = hub
        self.sid = stream_id
        self.wav = np.asarray(wav, np.float32).reshape(-1)
        self.sr = sr
        self.chunk = chunk
        self.realtime = realtime
        self.pushed = 0

    def run(self):
        period = self.chunk / self.sr
        next_t = time.perf_counter()
        for i in range(0, len(self.wav), self.chunk):
            piece = self.wav[i : i + self.chunk]
            if len(piece) < self.chunk:
                piece = np.pad(piece, (0, self.chunk - len(piece)))
            self.hub.push_input(self.sid, piece)
            self.pushed += self.chunk
            if self.realtime:
                next_t += period
                dt = next_t - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)


class Sink(threading.Thread):
    """Drains a stream's enhanced audio and records arrival latency vs the
    mic's real-time clock."""

    def __init__(self, hub, stream_id: int, total: int, chunk: int,
                 t_start: float, sr: int):
        super().__init__(daemon=True)
        self.hub = hub
        self.sid = stream_id
        self.total = total
        self.chunk = chunk
        self.t_start = t_start
        self.sr = sr
        self.audio = np.zeros(0, np.float32)
        self.latencies_ms = []

    def run(self):
        while len(self.audio) < self.total:
            got = self.hub.pop_output(self.sid, self.chunk)
            if len(got) == 0:
                time.sleep(0.001)
                continue
            now = time.perf_counter()
            # the mic produced the last sample of this piece at:
            produced_at = self.t_start + (len(self.audio) + len(got)) / self.sr
            self.latencies_ms.append((now - produced_at) * 1000.0)
            self.audio = np.concatenate([self.audio, got])


def main(args):
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.server import StreamingServer
    from puresound_tpu.tasks.base import BaseTrainer

    sr = 16000
    chunk = max(1, int(sr * args.chunk_ms / 1000) // 16) * 16
    engine = build_flagship_engine()
    variables = engine.init(jax.random.PRNGKey(0), jnp.zeros((1, chunk)),
                            jnp.zeros((1, 3200)), method=StreamingTSE.init_all)
    if args.ckpt:
        variables = BaseTrainer.load_params_from_ckpt(args.ckpt, variables)

    enroll, e_sr = AudioIO.open(args.enroll)
    if e_sr != sr:
        enroll = AudioIO.resample(enroll, e_sr, sr)
    wav, w_sr = AudioIO.open(args.input)
    if w_sr != sr:
        wav = AudioIO.resample(wav, w_sr, sr)
    wav = wav[0, : int(args.seconds * sr)]

    N = args.n_mics
    dvec = engine.apply(variables, jnp.asarray(
        np.repeat(enroll[0][None], N, 0)), method=StreamingTSE.embed)
    state = engine.apply(variables, N, method=StreamingTSE.init_state)

    state_box = {"state": state}

    @jax.jit
    def _step(chunk_b, dvec, state):
        return engine.apply(variables, chunk_b, dvec, state,
                            method=StreamingTSE.step)

    def step_fn(batch_np):
        out, new_state = _step(jnp.asarray(batch_np), dvec,
                               state_box["state"])
        state_box["state"] = new_state
        return out

    step_fn(np.zeros((N, chunk), np.float32))  # compile before going live

    server = StreamingServer(step_fn, n_streams=N, chunk_samples=chunk)
    server.start()

    t0 = time.perf_counter()
    mics = [SimulatedMicrophone(server.hub, i, wav, sr, chunk,
                                realtime=not args.no_realtime)
            for i in range(N)]
    sinks = [Sink(server.hub, i, len(wav) // chunk * chunk, chunk, t0, sr)
             for i in range(N)]
    for s in sinks:
        s.start()
    for m in mics:
        m.start()
    for m in mics:
        m.join()
    deadline = time.perf_counter() + 10.0
    for s in sinks:
        s.join(timeout=max(0.0, deadline - time.perf_counter()))
    server.stop()

    os.makedirs(args.out_dir, exist_ok=True)
    print(f"\nlive demo: {N} simulated mics, {args.seconds:.1f}s each, "
          f"{chunk / sr * 1000:.0f} ms chunks, {server.ticks} server ticks")
    for i, s in enumerate(sinks):
        lat = np.asarray(s.latencies_ms) if s.latencies_ms else np.zeros(1)
        out_path = os.path.join(args.out_dir, f"enhanced_{i}.wav")
        AudioIO.save(s.audio.reshape(1, -1), out_path, sr)
        print(f"  mic {i}: {len(s.audio) / sr:.2f}s out, latency "
              f"p50={np.percentile(lat, 50):.1f} ms "
              f"p95={np.percentile(lat, 95):.1f} ms -> {out_path}")
    ok = all(len(s.audio) >= s.total for s in sinks)
    print("real-time:", "OK" if ok else "UNDERRUN")
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--enroll", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--n-mics", type=int, default=4)
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--chunk-ms", type=float, default=20.0)
    p.add_argument("--out-dir", default="/tmp/live_demo")
    p.add_argument("--no-realtime", action="store_true",
                   help="push audio as fast as possible (throughput mode)")
    p.add_argument("--backend", default=None, choices=(None, "cpu", "tpu"),
                   help="cpu forces host execution (the env presets a TPU)")
    args = p.parse_args()
    sys.exit(main(args))
