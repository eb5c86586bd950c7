"""Streaming SIMO separation engine (STFT-domain DPARN_Mout — the DSS
near/far task). Beyond the reference, which has no streaming separation:
the masker emits M masks per frame; the mixture feature stream is applied
against each and M overlap-add streams are synthesized in one batched op.

Same latency/equivalence contract as StreamingNS (ns_engine.py), with a
leading source axis on the output: streamed chunks of x equal offline
`SiMoTaskWrapModule.inference` on [zeros(n_fft - hop), x] per source.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import overlap_add
from ..nnet.base_nn import apply_tf_masks, get_mask, wav_output_constrain
from ..nnet.encoder import ConvEncDec


class StreamingDSS(nn.Module):
    """Streaming wrapper sharing the SiMoTaskWrapModule param structure
    (encoder / masker names line up, so trained variables load directly)."""

    encoder: nn.Module
    masker: nn.Module
    mask_constraint: str = "linear"
    output_constraint: str = "linear"
    drop_first_bin: bool = True
    f_type: str = "Complex"
    mask_type: str = "Complex"

    def setup(self):
        if not isinstance(self.encoder, ConvEncDec):
            raise TypeError("StreamingDSS requires a ConvEncDec (STFT) encoder")

    @property
    def _n_fft(self) -> int:
        return self.encoder.fft_length

    @property
    def _hop(self) -> int:
        return self.encoder.hop_length

    @property
    def _n_src(self) -> int:
        return self.masker.multi_output

    def _encode_ri(self, buf: jnp.ndarray) -> jnp.ndarray:
        feats = self.encoder(buf)  # [B, F, K, 2]
        re, im = feats[..., 0], feats[..., 1]
        if self.drop_first_bin:
            re, im = re[:, 1:], im[:, 1:]
        return jnp.concatenate([re, im], axis=1)  # [B, C, K]

    def init_all(self, chunk: jnp.ndarray):
        """Init helper touching all params via the offline paths."""
        ri = self._encode_ri(chunk)
        mask = self.masker(ri)
        return self.encoder.inverse(self.encoder(chunk))

    def init_state(self, batch: int, dtype=jnp.float32,
                   mk_kernel: bool = False) -> dict:
        tail = self._n_fft - self._hop
        from ..dsp.stft import periodic_hann_sumsquare

        masker_kw = {"mk_kernel": True} if mk_kernel else {}
        return {
            "enc_tail": jnp.zeros((batch, tail), dtype),
            "ola_tail": jnp.zeros((batch, self._n_src, tail), dtype),
            "wsum": jnp.asarray(periodic_hann_sumsquare(self._n_fft,
                                                        self._hop)),
            "masker": self.masker.init_stream_state(batch, dtype,
                                                    **masker_kw),
        }

    def step(self, chunk: jnp.ndarray, state: dict,
             fused: bool = False,
             mk_kernel: bool = False) -> Tuple[jnp.ndarray, dict]:
        """Advance every stream by a chunk of S samples (S % hop == 0).

        Returns ([B, M, S], new state): the M separated signals, each
        delayed by n_fft - hop samples vs the input. fused=True routes the
        masker recurrences through the Pallas LSTM scan; mk_kernel=True
        runs the center-fused masker kernel (d4 + bottleneck + u0, state
        from init_state(mk_kernel=True))."""
        n_fft, hop, M = self._n_fft, self._hop, self._n_src
        B, S = chunk.shape
        assert S % hop == 0, "chunk length must be a multiple of the hop"
        K = S // hop

        # --- analysis
        buf = jnp.concatenate([state["enc_tail"], chunk], axis=-1)
        ri = self._encode_ri(buf)  # [B, C, K]
        new_enc_tail = buf[:, -(n_fft - hop):]

        # --- M masks, applied to the repeated mixture (base_nn.py:338-347)
        assert not (fused and mk_kernel), \
            "fused and mk_kernel are mutually exclusive"
        kw = {"fused": True} if fused else {}
        if mk_kernel:
            kw = {"mk_kernel": True}
        mask, masker_state = self.masker.stream_frames(ri, state["masker"],
                                                       **kw)
        mask = get_mask(mask, self.mask_constraint)  # [B, M, C, K]
        C = ri.shape[1]
        rep = jnp.broadcast_to(ri[:, None], (B, M, C, K)).reshape(B * M, C, K)
        enh = apply_tf_masks(rep, mask.reshape(B * M, C, K),
                             mask_type=self.mask_type, f_type=self.f_type)

        # --- batched synthesis of all B*M streams
        enh_re, enh_im = jnp.split(enh, 2, axis=1)
        if self.drop_first_bin:
            pad = jnp.zeros((B * M, 1, K), enh_re.dtype)
            enh_re = jnp.concatenate([pad, enh_re], axis=1)
            enh_im = jnp.concatenate([pad, enh_im], axis=1)
        frames = self.encoder.encoder.synthesis_frames(enh_re, enh_im)
        ola = overlap_add(frames, hop).reshape(B, M, S + n_fft - hop)
        ola = ola.at[..., : n_fft - hop].add(state["ola_tail"])
        emit = ola[..., :S] / jnp.tile(state["wsum"], K)[None, None, :]
        new_ola_tail = ola[..., S:]

        out = wav_output_constrain(emit, self.output_constraint)
        return out, {"enc_tail": new_enc_tail, "ola_tail": new_ola_tail,
                     "wsum": state["wsum"], "masker": masker_state}
