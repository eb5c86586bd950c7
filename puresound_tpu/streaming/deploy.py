"""One-call deployment: trained model -> production :class:`SessionServer`.

Bridges the model zoo / checkpoint surface to the serving runtime: given an
offline wrapper module and its (trained) variables, build the matching
streaming engine, a jitted fixed-shape batched step, exact per-leaf slot
axes for in-jit session resets, and optional bf16 / fused-kernel serving
modes — everything `bench.py` and the tests assemble by hand, as one
function the recipe CLIs (`--action serve`) call directly.

The reference has no serving deployment story at all — its closest artifact
is the single-stream tkinter demo (reference: egs/tse/demo/demo_app.py).
"""
from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Callable, Optional

from .engine import StreamingTSE
from .file_eval import build_engine, engine_step_options
from .ns_engine import StreamingNS
from .server import SessionServer, infer_slot_axes
from .simo_engine import StreamingDSS

__all__ = ["ServingBundle", "make_session_server", "run_serve"]


@dataclass
class ServingBundle:
    """Everything a serving front-end needs."""

    server: SessionServer
    engine: object
    chunk_samples: int
    embed_fn: Optional[Callable]  # None for unconditioned NS engines
    embed_dim: Optional[int]
    n_sources: int = 1  # >1: SIMO separation, sources sample-interleaved


def make_session_server(model, variables, n_slots: int,
                        chunk_ms: float = 16.0, sr: int = 16000,
                        half: bool = False, fused: bool = False,
                        dp_kernel: bool = False, attn_kernel: bool = False,
                        mk_kernel: bool = False,
                        b_tile: Optional[int] = None,
                        enroll_len: Optional[int] = None,
                        mesh=None, pipelined: bool = False,
                        lockstep: bool = False,
                        ring_capacity: int = 1 << 16,
                        pcm16: bool = False,
                        pcm16_scale: float = 8192.0) -> ServingBundle:
    """Build a ready-to-tick SessionServer for a trained offline model.

    Args:
        model/variables: the offline wrapper (SoTaskWrapModule) and its
            loaded checkpoint variables — exactly what `--action eval` uses.
        n_slots: fixed concurrent-session capacity (the compiled batch).
        chunk_ms: tick size; rounded DOWN to a hop multiple.
        half: serve in bfloat16 (params + state; streaming/halfprec). The
            hub/socket surface stays float32 — the step casts at the edge.
        fused / dp_kernel / attn_kernel / mk_kernel: the same Pallas serving
            kernels as `--action stream_eval` (validated per engine family).
            For time-domain TSE engines `fused` selects the VMEM-resident
            SkiM kernel with ``b_tile`` (default min(1024, n_slots);
            n_slots must be a multiple of it).
        enroll_len: expected enrollment waveform length in samples for TSE
            sessions (defaults to 5 s). Clients may send any length but
            each distinct length costs one embed_fn compile.
        mesh / pipelined / lockstep / ring_capacity: passed to SessionServer.
        pcm16: move per-tick audio host<->device as int16 PCM at
            pcm16_scale (half the transfer bytes each way — the lever when
            the tick is transfer/RTT-bound). The int16<->float conversion
            happens INSIDE the jitted step; the hub/socket surface stays
            float32. ~69 dB quantization SNR at the default scale.
    """
    import jax
    import jax.numpy as jnp

    from .halfprec import to_half

    engine = build_engine(model)

    hop = engine.encoder.hop_length
    chunk = max(1, int(round(sr * chunk_ms / 1000.0)) // hop) * hop
    dt = jnp.bfloat16 if half else jnp.float32
    if half:
        variables = to_half(variables)
    if mesh is not None and (fused or dp_kernel or attn_kernel or mk_kernel):
        # GSPMD cannot partition the Pallas serving kernels over the dp
        # mesh (only the stock step is tested sharded); fail fast instead
        # of an opaque first-tick compile error
        raise ValueError("mesh serving supports the stock step only — "
                         "drop the fused/dp_kernel/attn_kernel/mk_kernel "
                         "flags (or serve single-device with them)")

    # TSE fused-kernel serving options (time-domain engine); STFT engines
    # take theirs through engine_step_options below
    tse_kw = {}
    if isinstance(engine, StreamingTSE):
        if dp_kernel or attn_kernel or mk_kernel:
            raise ValueError("dp_kernel/attn_kernel/mk_kernel apply to "
                             "STFT-domain engines; time-domain TSE serving "
                             "fuses via fused=True (SkiM kernel)")
        step_kw, init_kw = {}, {}
        if fused:
            bt = min(b_tile or 1024, n_slots)
            if n_slots % bt:
                raise ValueError(f"n_slots={n_slots} must be a multiple of "
                                 f"b_tile={bt} for fused TSE serving")
            tse_kw = dict(fused=True, b_tile=bt, dot_dtype=dt)
        seg = getattr(engine.masker, "seg_size", None)
        if seg is not None and (chunk // hop) % seg:
            warnings.warn(
                f"chunk of {chunk // hop} frames does not cover whole SkiM "
                f"segments (seg_size={seg}): sessions attached mid-serving "
                "will see shifted segment boundaries vs a fresh engine "
                "(SkiM's segment clock is shared across slots). Attach-"
                "before-first-tick serving is unaffected.", stacklevel=2)
    else:
        step_kw, init_kw = engine_step_options(
            engine, fused=fused, dp_kernel=dp_kernel,
            attn_kernel=attn_kernel, mk_kernel=mk_kernel)

    # ---------------------------------------------------------------- embed
    embed_fn = None
    embed_dim = None
    has_spk = getattr(engine, "speaker_net", None) is not None
    if has_spk:
        method = type(engine).embed

        @jax.jit
        def embed_fn(enroll):
            e = engine.apply(variables, jnp.asarray(enroll, dt),
                             method=method)
            return e.astype(jnp.float32)

        L = enroll_len or 5 * sr
        out = jax.eval_shape(embed_fn,
                             jax.ShapeDtypeStruct((1, L), jnp.float32))
        if len(out.shape) != 2:
            raise ValueError(
                "embedding-free conditioning (enrollment enters through the "
                f"recurrent state, embed output {out.shape}) cannot attach "
                "per-slot sessions — serve it with a fixed-batch "
                "StreamingServer instead")
        embed_dim = int(out.shape[-1])

    # ----------------------------------------------------------------- step
    n_sources = 1
    if isinstance(engine, StreamingTSE) and not has_spk:
        # embedding-free TSE (zoo veve_dprnn_v0_causal): the enrollment
        # conditions the masker's INITIAL recurrent state, so a per-slot
        # session would need per-slot state injection at attach — which the
        # masked fresh-state reset cannot express. Without this guard the
        # 3-arg step_fn dies with a TypeError on the serving thread's first
        # tick (embed_dim is None, so tick calls step_fn(batch, state)).
        raise ValueError(
            "embedding-free TSE conditioning lives in the initial recurrent "
            "state; SessionServer cannot attach per-slot sessions for it — "
            "serve a fixed cohort with StreamingServer instead")
    if isinstance(engine, StreamingTSE):

        @jax.jit
        def step_fn(chunk_b, dvec, st):
            out, st = engine.apply(variables, chunk_b.astype(dt),
                                   dvec.astype(dt), st,
                                   method=StreamingTSE.step, **tse_kw)
            return out.astype(jnp.float32), st

    elif isinstance(engine, StreamingDSS):

        @jax.jit
        def step_fn(chunk_b, st):
            out, st = engine.apply(variables, chunk_b.astype(dt), st,
                                   method=StreamingDSS.step, **step_kw)
            # [B, M, S] -> sample-interleaved [B, S*M] so the M separated
            # sources ride the per-stream single-channel output ring
            B, M, S = out.shape
            out = jnp.swapaxes(out, 1, 2).reshape(B, S * M)
            return out.astype(jnp.float32), st

    elif isinstance(engine, StreamingNS) and has_spk:

        @jax.jit
        def step_fn(chunk_b, dvec, st):
            out, st = engine.apply(variables, chunk_b.astype(dt), st,
                                   dvec.astype(dt),
                                   method=StreamingNS.step, **step_kw)
            return out.astype(jnp.float32), st

    else:

        @jax.jit
        def step_fn(chunk_b, st):
            out, st = engine.apply(variables, chunk_b.astype(dt), st,
                                   method=StreamingNS.step, **step_kw)
            return out.astype(jnp.float32), st

    if pcm16:
        # int16 transfer wrapper: dequantize/quantize INSIDE the jit so
        # only int16 crosses the host<->device link (SessionServer does
        # the matching host-side conversions)
        inner_step = step_fn
        scale = float(pcm16_scale)
        if embed_fn is not None:

            @jax.jit
            def step_fn(chunk_b, dvec, st):
                out, st = inner_step(chunk_b.astype(jnp.float32) / scale,
                                     dvec, st)
                return (jnp.clip(out * scale, -32767.0, 32767.0)
                        .astype(jnp.int16), st)

        else:

            @jax.jit
            def step_fn(chunk_b, st):
                out, st = inner_step(chunk_b.astype(jnp.float32) / scale, st)
                return (jnp.clip(out * scale, -32767.0, 32767.0)
                        .astype(jnp.int16), st)

    init_state = lambda n: engine.apply(variables, n, dt,
                                        method=type(engine).init_state,
                                        **init_kw)
    if isinstance(engine, StreamingDSS):
        # output width per tick = chunk * n_sources (read without compiling)
        st1 = jax.eval_shape(lambda: init_state(1))
        out_sd = jax.eval_shape(
            step_fn, jax.ShapeDtypeStruct((1, chunk), jnp.float32), st1)[0]
        n_sources = int(out_sd.shape[1]) // chunk
    # shapes only — eval_shape keeps the two probe inits off the device
    # (an eager init materializes dozens of leaves at ~30 ms RTT each on
    # the tunneled backend)
    slot_axes = infer_slot_axes(
        lambda n: jax.eval_shape(lambda: init_state(n)))
    server = SessionServer(step_fn, init_state(n_slots), n_slots, chunk,
                           embed_fn=embed_fn, embed_dim=embed_dim,
                           slot_axes=slot_axes, mesh=mesh,
                           pipelined=pipelined, lockstep=lockstep,
                           ring_capacity=ring_capacity, pcm16=pcm16,
                           pcm16_scale=pcm16_scale)
    return ServingBundle(server=server, engine=engine, chunk_samples=chunk,
                         embed_fn=embed_fn, embed_dim=embed_dim,
                         n_sources=n_sources)


def run_serve(model, variables, n_slots: int, host: str = "0.0.0.0",
              port: int = 7654, stats_every_s: float = 10.0,
              stop_event=None, on_started=None, **kw) -> None:
    """Blocking serve entry point for the recipe CLIs (`--action serve`).

    Builds the SessionServer (make_session_server kwargs pass through),
    opens the TCP front-end, and prints periodic QoS telemetry until
    Ctrl-C (or `stop_event` is set; with `on_started(front, bundle)` these
    two let a test or embedding application drive the live server).
    """
    import time

    from .socket_server import SocketServingFront

    bundle = make_session_server(model, variables, n_slots, **kw)
    front = SocketServingFront(bundle.server, host=host, port=port,
                               n_sources=bundle.n_sources).start()
    addr = front.address
    if on_started is not None:
        on_started(front, bundle)
    mode = ("TSE (per-session enrollment)" if bundle.embed_fn else
            f"SIMO x{bundle.n_sources}" if bundle.n_sources > 1 else "NS")
    print(f"[serve] {mode} on {addr[0]}:{addr[1]} — {n_slots} slots, "
          f"{bundle.chunk_samples} samples/tick "
          f"({bundle.chunk_samples / (kw.get('sr', 16000) / 1000.0):.1f} ms)",
          flush=True)
    try:
        while stop_event is None or not stop_event.is_set():
            time.sleep(stats_every_s if stop_event is None else 0.05)
            if stop_event is None:
                s = bundle.server.stats.snapshot()
                print(f"[serve] active={bundle.server.n_active}/{n_slots} "
                      f"ticks={s['ticks']} p50={s['tick_ms_p50']:.2f}ms "
                      f"p99={s['tick_ms_p99']:.2f}ms "
                      f"underruns={s['underrun_slot_ticks']}", flush=True)
    except KeyboardInterrupt:
        print("[serve] shutting down", flush=True)
    finally:
        front.stop()
