"""Streaming inference engine: stateful jitted step batched over streams.

This is the TPU-native re-design of the reference's Python per-frame loop
(puresound/streaming/skim_inference.py + egs/tse/demo/utils.py:100-128):
ALL per-stream state — encoder ring tail, per-block SkiM (h, c), MemLSTM
internals, decoder overlap-add carry — lives in one explicit pytree with a
leading stream-batch axis. One jitted `step` advances every stream by a
chunk; serving N concurrent streams is just batch dimension N, sharded
across chips with pjit (no collectives needed in the step).

Equivalence contract (tested): feeding chunks of x equals offline
`inference` on [zeros(win-hop), x] truncated to the emitted length —
identical to the demo's zero-primed 2-hop sliding window.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..dsp.stft import overlap_add
from ..nnet.base_nn import get_mask, wav_output_constrain
from ..nnet.encoder import FreeEncDec


class StreamingTSE(nn.Module):
    """Streaming wrapper sharing the SoTaskWrapModule param structure.

    Construct with the SAME submodule definitions as the offline wrapper so
    a trained offline checkpoint loads directly (encoder / masker /
    speaker_net names line up 1:1).

    Usage:
        engine = StreamingTSE(encoder=..., masker=..., speaker_net=...,
                              mask_constraint=..., output_constraint=...)
        dvec  = engine.apply(params, enroll, method=StreamingTSE.embed)
        state = engine.apply(params, batch, method=StreamingTSE.init_state)
        out, state = engine.apply(params, chunk, dvec, state,
                                  method=StreamingTSE.step)
    """

    encoder: nn.Module
    masker: nn.Module
    speaker_net: Optional[tuple] = None
    encoder_spk: Optional[nn.Module] = None
    mask_constraint: str = "linear"
    output_constraint: str = "linear"

    def setup(self):
        if not isinstance(self.encoder, FreeEncDec):
            raise TypeError("StreamingTSE requires a FreeEncDec encoder "
                            "(time-domain streaming models)")
        if not (hasattr(self.masker, "init_state")
                and hasattr(self.masker, "step_frames")):
            raise TypeError("StreamingTSE requires a masker with the "
                            "streaming API (init_state/step_frames): "
                            "SkiM or causal ConvTasNet")

    def init_all(self, chunk: jnp.ndarray, enroll: jnp.ndarray):
        """Initialization helper: touches every parameterized submodule via
        the OFFLINE paths (param creation inside the streaming scan/cond
        would leak tracers), so `engine.init(key, chunk, enroll,
        method=StreamingTSE.init_all)` builds the full variable tree with
        the same structure the streaming step reads."""
        dvec = self.embed(enroll)
        feats = self.encoder(chunk)
        mask = self.masker(feats, dvec)
        return self.encoder.inverse(feats * mask)

    # ------------------------------------------------------------ embedding
    def embed(self, enroll: jnp.ndarray) -> jnp.ndarray:
        """Enrollment waveform [B, L] -> speaker embedding [B, E] (or the
        raw enrollment features [B, C, T'] for embedding-free TSE, where
        conditioning enters via `init_state`'s enroll_feats instead)."""
        enc = self.encoder_spk if self.encoder_spk is not None else self.encoder
        feats = enc(enroll)
        if self.speaker_net is None:
            return feats
        x = feats
        for layer in self.speaker_net:
            try:
                x = layer(x, train=False)
            except TypeError:
                x = layer(x)
        return x.squeeze(-1)

    # ---------------------------------------------------------------- state
    def init_state(self, batch: int, dtype=jnp.float32,
                   enroll_feats: Optional[jnp.ndarray] = None) -> dict:
        """enroll_feats: for embedding-free maskers (DPRNN veve), the
        `embed` output — written into the masker's initial recurrent state
        (reference dprnn.py:120-126); pass dvec=None to `step` then."""
        win, hop = self.encoder.win_length, self.encoder.hop_length
        masker_state = self.masker.init_state(batch, dtype)
        if enroll_feats is not None:
            masker_state = self.masker.condition_stream_state(masker_state,
                                                              enroll_feats)
        return {
            "enc_tail": jnp.zeros((batch, win - hop), dtype),
            "dec_tail": jnp.zeros((batch, win - hop), dtype),
            "skim": masker_state,
        }

    # ----------------------------------------------------------------- step
    def step(self, chunk: jnp.ndarray, dvec: Optional[jnp.ndarray],
             state: dict, fused: bool = False, b_tile: int = 128,
             dot_dtype=jnp.float32,
             int8_hh: bool = False,
             int8_full: bool = False) -> Tuple[jnp.ndarray, dict]:
        """Advance every stream by one chunk.

        chunk: [B, S] with S a multiple of hop. Returns ([B, S], new state).
        fused=True uses the Pallas VMEM-resident SkiM kernel (requires the
        chunk's frame count to divide seg_size and B % b_tile == 0).
        """
        win, hop = self.encoder.win_length, self.encoder.hop_length
        B, S = chunk.shape
        assert S % hop == 0, "chunk length must be a multiple of the hop"

        # --- encode: frames over [tail | chunk]
        buf = jnp.concatenate([state["enc_tail"], chunk], axis=-1)
        feats = self.encoder(buf)  # [B, C, K] — K = S // hop frames
        new_enc_tail = buf[:, -(win - hop):]

        # --- mask via the streaming SkiM core
        frames = jnp.swapaxes(feats, 1, 2)  # [B, K, C]
        if fused:
            mask, skim_state = self.masker.step_frames_fused(
                frames, dvec, state["skim"], b_tile=b_tile,
                dot_dtype=dot_dtype, int8_hh=int8_hh, int8_full=int8_full)
        else:
            mask, skim_state = self.masker.step_frames(frames, dvec, state["skim"])
        mask = get_mask(mask, self.mask_constraint)  # [B, C, K]
        enh = feats * mask

        # --- decode + overlap-add with carry
        frame_wavs = jnp.einsum("bck,cw->bkw", enh,
                                self.encoder.dec_w[:, 0, :])  # [B, K, win]
        full = overlap_add(frame_wavs, hop)  # [B, S + win - hop]
        # add the carried tail into the FULL buffer before slicing (not into
        # the emit slice): with >50% overlap (win - hop > S) part of the
        # carry lands beyond the emitted samples and must survive into the
        # new tail — the slice-then-add form drops it (ns_engine.py pattern)
        full = full.at[:, : win - hop].add(state["dec_tail"])
        emit = full[:, :S]
        new_dec_tail = full[:, S:]

        out = wav_output_constrain(emit, self.output_constraint)
        new_state = {"enc_tail": new_enc_tail, "dec_tail": new_dec_tail,
                     "skim": skim_state}
        return out, new_state


def offline_equivalent_input(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """The offline input whose inference equals the streamed output:
    zero-prime by (win - hop) samples (the demo's initial queue)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(win - hop, 0)]
    return jnp.pad(x, pad)
