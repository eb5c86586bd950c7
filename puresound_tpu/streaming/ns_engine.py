"""Streaming engine for STFT-domain models (NS DPCRN/DPARN, TSE UnetTcn).

Extends the streaming story beyond the reference (which only streams SkiM):
a causal STFT-domain model runs as a chunked stateful jitted step batched
over streams — conv layers carry a 1-frame time context, recurrent
bottlenecks carry (h, c), and the iSTFT overlap-add keeps an (n_fft - hop)
sample tail.

Latency: output lags input by (n_fft - hop) samples (24 ms at 512/128) —
the inherent OLA synthesis delay — plus the chunk length, plus
`masker.stream_delay_frames * hop` samples when the masker has algorithmic
lookahead (UnetTcn transpose_delay: 6 frames * 128 = 768, totalling the
documented 1152-sample lookahead; reference unet.py:298 config).

Equivalence contract (tested): streamed chunks of x equal offline
`inference` on [zeros(n_fft - hop), x] delayed by the masker's
stream-delay, for samples past the first window (the offline edge
normalizer differs on the very first n_fft - hop samples).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import overlap_add
from ..nnet.base_nn import apply_tf_masks, get_mask, wav_output_constrain
from ..nnet.encoder import ConvEncDec


class StreamingNS(nn.Module):
    """Streaming wrapper sharing the SoTaskWrapModule param structure for
    STFT-domain models (ConvEncDec encoder + a masker exposing
    init_stream_state / stream_frames). With `speaker_net` set it serves
    STFT-domain TSE (e.g. causal UnetTcn): `embed` the enrollment once,
    then pass the dvec to every `step`."""

    encoder: nn.Module
    masker: nn.Module
    speaker_net: Optional[tuple] = None
    encoder_spk: Optional[nn.Module] = None
    mask_constraint: str = "linear"
    output_constraint: str = "linear"
    drop_first_bin: bool = True
    f_type: str = "Complex"
    mask_type: str = "Complex"

    def setup(self):
        if not isinstance(self.encoder, ConvEncDec):
            raise TypeError("StreamingNS requires a ConvEncDec (STFT) encoder")

    @property
    def _n_fft(self) -> int:
        return self.encoder.fft_length

    @property
    def _hop(self) -> int:
        return self.encoder.hop_length

    @property
    def _mask_delay(self) -> int:
        return getattr(self.masker, "stream_delay_frames", 0)

    @property
    def _feat_ch(self) -> int:
        bins = self._n_fft // 2 + 1 - (1 if self.drop_first_bin else 0)
        return 2 * bins

    def init_all(self, chunk: jnp.ndarray,
                 enroll: Optional[jnp.ndarray] = None):
        """Init helper touching all params via the offline paths."""
        feats = self.encoder(chunk)
        re, im = feats[..., 0], feats[..., 1]
        if self.drop_first_bin:
            re, im = re[:, 1:], im[:, 1:]
        ri = jnp.concatenate([re, im], axis=1)
        if self.speaker_net is not None:
            mask = self.masker(ri, self.embed(enroll))
        else:
            mask = self.masker(ri)
        return self.encoder.inverse(feats)

    # ------------------------------------------------------------ embedding
    def embed(self, enroll: jnp.ndarray) -> jnp.ndarray:
        """Enrollment waveform [B, L] -> speaker embedding [B, E]."""
        enc = self.encoder_spk if self.encoder_spk is not None else self.encoder
        feats = enc(enroll)
        if isinstance(enc, ConvEncDec):
            re, im = feats[..., 0], feats[..., 1]
            if self.drop_first_bin:
                re, im = re[:, 1:], im[:, 1:]
            feats = jnp.concatenate([re, im], axis=1)
        x = feats
        for layer in self.speaker_net:
            try:
                x = layer(x, train=False)
            except TypeError:
                x = layer(x)
        return x.squeeze(-1)

    def init_state(self, batch: int, dtype=jnp.float32,
                   dp_kernel: bool = False,
                   mk_kernel: bool = False) -> dict:
        tail = self._n_fft - self._hop
        from ..dsp.stft import periodic_hann_sumsquare

        self_norm = jnp.asarray(periodic_hann_sumsquare(self._n_fft,
                                                        self._hop))
        masker_kw = {}
        if dp_kernel:
            masker_kw["dp_kernel"] = True
        if mk_kernel:
            masker_kw["mk_kernel"] = True
        state = {
            "enc_tail": jnp.zeros((batch, tail), dtype),
            "ola_tail": jnp.zeros((batch, tail), dtype),
            "wsum": self_norm,
            "masker": self.masker.init_stream_state(batch, dtype, **masker_kw),
        }
        if self._mask_delay > 0:
            # lookahead maskers emit mask[t - delay] at time t; delay the
            # feature stream to pair each mask with its own frame
            state["feat_q"] = jnp.zeros(
                (batch, self._feat_ch, self._mask_delay), dtype)
        return state

    def step(self, chunk: jnp.ndarray, state: dict,
             dvec: Optional[jnp.ndarray] = None,
             fused: bool = False,
             dp_kernel: bool = False,
             int8_hh: bool = False,
             attn_kernel: bool = False,
             xscr_half: bool = False,
             mk_kernel: bool = False,
             dp_sub_tiles: int = 1) -> Tuple[jnp.ndarray, dict]:
        """Advance every stream by a chunk of S samples (S % hop == 0).

        Returns ([B, S], new state): the enhanced signal delayed by
        n_fft - hop (+ stream_delay_frames * hop) samples vs the input.
        fused=True routes the masker's recurrences through the Pallas
        VMEM-resident LSTM scan (DPCRN/DPARN maskers). dp_kernel=True
        (DPCRN only) fuses the whole dual-path bottleneck into one Pallas
        kernel (state from init_state(dp_kernel=True)).
        """
        n_fft, hop = self._n_fft, self._hop
        B, S = chunk.shape
        assert S % hop == 0, "chunk length must be a multiple of the hop"
        K = S // hop

        # --- analysis (one matmul: framing slices -> RI-packed kernel)
        buf = jnp.concatenate([state["enc_tail"], chunk], axis=-1)
        ri = self.encoder.encoder.stream_analysis_ri(
            buf, K, self.drop_first_bin)  # [B, C, K]
        new_enc_tail = buf[:, -(n_fft - hop):]

        # --- mask
        assert sum(map(bool, (fused, dp_kernel, mk_kernel))) <= 1, \
            "fused / dp_kernel / mk_kernel are mutually exclusive"
        kw = {"fused": True} if fused else {}
        if attn_kernel:
            kw["attn_kernel"] = True
        if dp_kernel or mk_kernel:
            kw = {"dp_kernel": True} if dp_kernel else {"mk_kernel": True}
            if int8_hh:
                kw["int8_hh"] = True
            if xscr_half:
                kw["xscr_half"] = True
            if dp_kernel and dp_sub_tiles > 1:
                kw["dp_sub_tiles"] = dp_sub_tiles
        if dvec is not None:
            mask, masker_state = self.masker.stream_frames(
                ri, state["masker"], dvec, **kw)
        else:
            mask, masker_state = self.masker.stream_frames(ri, state["masker"],
                                                           **kw)
        mask = get_mask(mask, self.mask_constraint)
        feats_use = ri
        new_feat_q = None
        if self._mask_delay > 0:
            cat = jnp.concatenate([state["feat_q"], ri], axis=-1)
            feats_use = cat[..., :K]
            new_feat_q = cat[..., K:]
        enh = apply_tf_masks(feats_use, mask, mask_type=self.mask_type,
                             f_type=self.f_type)

        # --- synthesis (one matmul: Hermitian + iDFT + window folded)
        frames = self.encoder.encoder.stream_synthesis_frames(
            enh, self.drop_first_bin)
        ola = overlap_add(frames, hop)  # [B, S + n_fft - hop]
        ola = ola.at[:, : n_fft - hop].add(state["ola_tail"])
        emit = ola[:, :S] / jnp.tile(state["wsum"], K)[None, :]
        new_ola_tail = ola[:, S:]

        out = wav_output_constrain(emit, self.output_constraint)
        new_state = {"enc_tail": new_enc_tail, "ola_tail": new_ola_tail,
                     "wsum": state["wsum"], "masker": masker_state}
        if new_feat_q is not None:
            new_state["feat_q"] = new_feat_q
        return out, new_state
