"""File-based streaming evaluation: run a waveform through a streaming
engine in real-time-sized chunks, flush the pipeline delay, and report the
real-time factor — the CLI-facing counterpart of the reference's demo-app
chunk loop (egs/tse/demo/utils.py:100-128), generalized to every streaming
engine here.
"""
from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import numpy as np

from .engine import StreamingTSE
from .ns_engine import StreamingNS
from .simo_engine import StreamingDSS


def engine_delay_samples(engine) -> int:
    """Samples by which the streamed output lags the input (to trim)."""
    if isinstance(engine, (StreamingNS, StreamingDSS)):
        hop = engine.encoder.hop_length
        mask_delay = getattr(engine.masker, "stream_delay_frames", 0)
        return (engine.encoder.fft_length - hop) + mask_delay * hop
    # time-domain (FreeEncDec) engines: output aligns with the zero-primed
    # offline signal; the (win - hop) prime is part of the contract, not lag
    return 0


def engine_step_options(engine, fused: bool = False, dp_kernel: bool = False,
                        attn_kernel: bool = False, mk_kernel: bool = False):
    """Validate kernel flags against the engine family and translate them
    into (step_kwargs, init_state_kwargs). Shared by the file-streaming
    evaluator and the serving deployment builder."""
    if sum(map(bool, (fused, dp_kernel, mk_kernel))) > 1:
        raise ValueError("--fused / --dp_kernel / --mk_kernel are mutually "
                         "exclusive (each already fuses the bottleneck)")
    if (fused or dp_kernel or mk_kernel) and not isinstance(
            engine, (StreamingNS, StreamingDSS)):
        raise ValueError("fused/dp_kernel/mk_kernel apply to STFT-domain engines "
                         f"(StreamingNS/StreamingDSS), not {type(engine).__name__}")
    if dp_kernel and not hasattr(engine.masker, "bottleneck_kernel_chunk"):
        raise ValueError("dp_kernel requires a DPCRN masker "
                         f"(got {type(engine.masker).__name__})")
    if mk_kernel and not hasattr(engine.masker, "center_kernel_chunk"):
        raise ValueError("mk_kernel requires a DPCRN or DPARN masker "
                         f"(got {type(engine.masker).__name__})")
    kw = {"fused": True} if fused else {}
    if attn_kernel:
        from ..nnet.dparn import _DPARNBase

        if not isinstance(engine.masker, _DPARNBase):
            raise ValueError("attn_kernel requires a DPARN masker "
                             f"(got {type(engine.masker).__name__})")
        kw["attn_kernel"] = True
    if dp_kernel:
        kw = {"dp_kernel": True}
    if mk_kernel:
        kw = {"mk_kernel": True}
    init_kw = {}
    if dp_kernel:
        init_kw["dp_kernel"] = True
    if mk_kernel:
        init_kw["mk_kernel"] = True
    return kw, init_kw


def stream_signal(engine, variables, wav: np.ndarray, sr: int,
                  chunk_ms: float = 16.0,
                  dvec: Optional[np.ndarray] = None,
                  half: bool = False, fused: bool = False,
                  dp_kernel: bool = False,
                  attn_kernel: bool = False,
                  mk_kernel: bool = False,
                  ) -> Tuple[np.ndarray, float]:
    """Stream `wav` [L] through `engine` chunk by chunk.

    Returns (enhanced [L] aligned with the input, real-time factor where
    RTF > 1 means faster than real time). Compile time is excluded (one
    warm-up step on zeros).

    half=True serves in bfloat16 (params + state; see streaming/halfprec).
    fused=True routes STFT-engine recurrences through the Pallas scan.
    dp_kernel=True (DPCRN engines) fuses the whole dual-path bottleneck
    into one VMEM-resident Pallas kernel. mk_kernel=True additionally
    fuses the center convs (d4 + u0) into that kernel
    (ops/masker_kernel.center_chunk).
    """
    import jax.numpy as jnp

    from .halfprec import to_half

    hop = engine.encoder.hop_length
    chunk = max(1, int(round(sr * chunk_ms / 1000.0)) // hop) * hop
    delay = engine_delay_samples(engine)
    wav = np.asarray(wav, np.float32).reshape(-1)
    L = wav.shape[0]
    n_chunks = -(-(L + delay) // chunk)
    dt = jnp.bfloat16 if half else jnp.float32
    if half:
        variables = to_half(variables)
        if dvec is not None:
            dvec = dvec.astype(dt)
    x = np.zeros((1, n_chunks * chunk), np.float32)
    x[0, :L] = wav

    kw, init_kw = engine_step_options(engine, fused=fused,
                                      dp_kernel=dp_kernel,
                                      attn_kernel=attn_kernel,
                                      mk_kernel=mk_kernel)
    if isinstance(engine, StreamingNS):
        if dvec is not None:
            step = jax.jit(lambda v, c, s, d: engine.apply(
                v, c, s, d, method=StreamingNS.step, **kw))
            run = lambda c, s: step(variables, c, s, dvec)
        else:
            step = jax.jit(lambda v, c, s: engine.apply(
                v, c, s, method=StreamingNS.step, **kw))
            run = lambda c, s: step(variables, c, s)
    elif isinstance(engine, StreamingDSS):
        step = jax.jit(lambda v, c, s: engine.apply(
            v, c, s, method=StreamingDSS.step, **kw))
        run = lambda c, s: step(variables, c, s)
    elif isinstance(engine, StreamingTSE):
        step = jax.jit(lambda v, c, d, s: engine.apply(
            v, c, d, s, method=StreamingTSE.step))
        run = lambda c, s: step(variables, c, dvec, s)
    else:
        raise TypeError(f"unknown streaming engine {type(engine)}")

    init_state = lambda: engine.apply(variables, 1, dt,
                                      method=type(engine).init_state,
                                      **init_kw)
    # warm-up compile, then stream for real
    y, _ = run(jnp.zeros((1, chunk), dt), init_state())
    y.block_until_ready()

    state = init_state()
    outs = []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        y, state = run(jnp.asarray(x[:, i * chunk:(i + 1) * chunk]).astype(dt),
                       state)
        outs.append(y)
    # sync on a VALUE fetch (plain device->host copy, no new executable):
    # on the tunneled backend block_until_ready can return before execution
    # completes (CLAUDE.md timing gotcha), which would overstate the RTF
    np.asarray(outs[-1])
    elapsed = time.perf_counter() - t0

    # [total] for SISO engines, [M, total] for SIMO (StreamingDSS)
    out = np.concatenate([np.asarray(o.astype(jnp.float32)) for o in outs],
                         axis=-1)[0]
    audio_sec = n_chunks * chunk / sr
    rtf = audio_sec / max(elapsed, 1e-9)
    return out[..., delay:delay + L], rtf


def build_engine(model):
    """Build the matching streaming engine for an offline SoTaskWrapModule
    (same param structure, so the trained variables load directly)."""
    from ..nnet.base_nn import SiMoTaskWrapModule
    from ..nnet.encoder import ConvEncDec, FreeEncDec

    if isinstance(model, SiMoTaskWrapModule):
        return StreamingDSS(encoder=model.encoder, masker=model.masker,
                            mask_constraint=model.mask_constraint,
                            output_constraint=model.output_constraint,
                            drop_first_bin=model.drop_first_bin,
                            f_type=model.f_type, mask_type=model.mask_type)
    if isinstance(model.encoder, ConvEncDec):
        return StreamingNS(encoder=model.encoder, masker=model.masker,
                           speaker_net=model.speaker_net,
                           encoder_spk=model.encoder_spk,
                           mask_constraint=model.mask_constraint,
                           output_constraint=model.output_constraint,
                           drop_first_bin=model.drop_first_bin,
                           f_type=model.f_type, mask_type=model.mask_type)
    if isinstance(model.encoder, FreeEncDec):
        return StreamingTSE(encoder=model.encoder, masker=model.masker,
                            speaker_net=model.speaker_net,
                            encoder_spk=model.encoder_spk,
                            mask_constraint=model.mask_constraint,
                            output_constraint=model.output_constraint)
    raise TypeError("no streaming engine for this encoder type")
