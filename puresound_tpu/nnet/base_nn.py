"""Task wrapper modules: mask algebra + SISO/SIMO end-to-end models.

Parity: puresound/nnet/base_nn.py (EncDecMaskerBaseModel :35,
SoTaskWrapModule :193, SiMoTaskWrapModule :780).

The wrapper composes encoder(+encoder_spk) + masker + speaker_net + loss
functions and dispatches between task modes:
  0: SE/BSS; 1: TSE multi-task (wav + alpha*spk); 2: contrastive (GE2E on
  [dvec, enhanced dvec]); 3: three-loss (wav + spk + triplet loop);
  4: embedding-free TSE.

Everything is a pure function of (params, inputs): `forward` returns losses
(per the reference's design) and `inference` returns waveforms; both jit
cleanly and shard over a batch axis with pjit.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoder import ConvEncDec


# ---------------------------------------------------------------------------
# Mask algebra (EncDecMaskerBaseModel parity)
# ---------------------------------------------------------------------------

def mul_complex(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Entrywise complex product of [.., 2] RI tensors."""
    r1, i1 = x1[..., 0], x1[..., 1]
    r2, i2 = x2[..., 0], x2[..., 1]
    return jnp.stack([r1 * r2 - i1 * i2, r1 * i2 + i1 * r2], axis=-1)


def get_mask(mask: jnp.ndarray, mask_constraint: str = "linear") -> jnp.ndarray:
    c = mask_constraint.lower()
    if c == "linear":
        return mask
    if c == "relu":
        return jax.nn.relu(mask)
    if c == "sigmoid":
        return jax.nn.sigmoid(mask)
    raise NotImplementedError(mask_constraint)


def apply_tf_masks(tf_rep: jnp.ndarray, est_masks: jnp.ndarray,
                   mask_type: str, f_type: str) -> jnp.ndarray:
    """Apply a TF mask. tf_rep / est_masks: [N, C, T] or [N, 2C, T] RI-concat.

    (mask_type, f_type) in {complex/complex, real/complex, real/real,
    polar/polar} — base_nn.py:41-79.
    """
    mt, ft = mask_type.lower(), f_type.lower()
    if mt == "complex" and ft == "complex":
        re, im = jnp.split(tf_rep, 2, axis=1)
        mre, mim = jnp.split(est_masks, 2, axis=1)
        out = mul_complex(jnp.stack([re, im], -1), jnp.stack([mre, mim], -1))
        return jnp.concatenate([out[..., 0], out[..., 1]], axis=1)
    if mt == "real" and ft == "complex":
        re, im = jnp.split(tf_rep, 2, axis=1)
        return jnp.concatenate([re * est_masks, im * est_masks], axis=1)
    if mt == "real" and ft == "real":
        return tf_rep * est_masks
    if mt == "polar" and ft == "polar":
        re, im = jnp.split(tf_rep, 2, axis=1)
        mre, mim = jnp.split(est_masks, 2, axis=1)
        tf_mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        tf_phase = jnp.arctan2(im, re)
        mask_mag = jnp.sqrt(mre**2 + mim**2 + 1e-8)
        mask_phase = jnp.arctan2(mim / (mask_mag + 1e-8), mre / (mask_mag + 1e-8))
        est_mag = tf_mag * jnp.tanh(mask_mag)
        est_phase = tf_phase + mask_phase
        return jnp.concatenate([est_mag * jnp.cos(est_phase),
                                est_mag * jnp.sin(est_phase)], axis=1)
    raise NameError(f"unsupported mask/feature combination {mask_type}/{f_type}")


def wav_output_constrain(wav: jnp.ndarray, mode: str) -> jnp.ndarray:
    m = mode.lower()
    if m == "linear":
        return jnp.clip(wav, -1.0, 1.0)
    if m == "sigmoid":
        return jax.nn.sigmoid(wav)
    raise NameError(mode)


def align_waveform(enh: jnp.ndarray, ref: jnp.ndarray,
                   truncate_enh: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Length-align (pad ref at front, or truncate). base_nn.py:398-412."""
    le, lr = enh.shape[-1], ref.shape[-1]
    if le == lr:
        return enh, ref
    if lr < le:
        pad = [(0, 0)] * (ref.ndim - 1) + [(le - lr, 0)]
        return enh, jnp.pad(ref, pad)
    if truncate_enh:
        return enh[..., :lr], ref
    return enh, ref[..., :le]


def _run_speaker_net(layers, x, train: bool):
    """Walk a heterogeneous speaker-net layer list (TCN / pooling / conv /
    feature layers), passing `train` to layers that accept it."""
    for layer in layers:
        try:
            x = layer(x, train=train)
        except TypeError:
            x = layer(x)
    return x


class SoTaskWrapModule(nn.Module):
    """Single-output task wrapper (SE / TSE / PVAD).

    Encoder -> (SpeakerNet) -> Masker -> mask apply -> Decoder; `__call__`
    returns the training loss (task-dispatched), `inference` the waveform.
    """

    encoder: nn.Module
    masker: nn.Module
    speaker_net: Optional[Sequence[Any]] = None
    encoder_spk: Optional[nn.Module] = None
    loss_func_wav: Optional[Callable] = None
    loss_func_spk: Optional[Any] = None
    loss_func_others: Optional[Any] = None
    embedding_free_tse: bool = False
    f_type: str = "real"
    mask_type: str = "real"
    mask_constraint: str = "linear"
    output_constraint: str = "linear"
    drop_first_bin: bool = False

    @property
    def task(self) -> Optional[int]:
        """Task label (base_nn.py:263-317)."""
        if self.speaker_net is None:
            return 4 if self.embedding_free_tse else 0
        if self.loss_func_spk is not None:
            if self.loss_func_wav is None:
                return 2
            return 3 if self.loss_func_others is not None else 1
        if self.loss_func_wav is None and self.loss_func_spk is None:
            return None  # inference mode
        return 1

    # ------------------------------------------------------------- features
    def _is_stft_encoder(self, enc) -> bool:
        return isinstance(enc, ConvEncDec)

    def _encode_mix(self, wav):
        """Waveform -> masker feature space ([N, C, T], RI-concat for STFT)."""
        feats = self.encoder(wav)
        if self._is_stft_encoder(self.encoder):
            re, im = feats[..., 0], feats[..., 1]
            if self.drop_first_bin:
                re, im = re[:, 1:, :], im[:, 1:, :]
            feats = jnp.concatenate([re, im], axis=1)
        return feats

    def _encode_enroll(self, wav, train: bool = False):
        enc = self.encoder_spk if self.encoder_spk is not None else self.encoder
        feats = enc(wav)
        if self._is_stft_encoder(enc):
            re, im = feats[..., 0], feats[..., 1]
            if self.drop_first_bin:
                re, im = re[:, 1:, :], im[:, 1:, :]
            feats = jnp.concatenate([re, im], axis=1)
        return feats

    def _decode(self, enh_feats):
        """Masked features -> waveform (re-pad DC bin for STFT encoders)."""
        if self._is_stft_encoder(self.encoder):
            re, im = jnp.split(enh_feats, 2, axis=1)
            if self.drop_first_bin:
                pad = jnp.zeros((re.shape[0], 1, re.shape[2]), re.dtype)
                re = jnp.concatenate([pad, re], axis=1)
                im = jnp.concatenate([pad, im], axis=1)
            enh_feats = jnp.stack([re, im], axis=-1)
        return self.encoder.inverse(enh_feats)

    def _dvec(self, enroll_feats, train: bool = False):
        dvec = _run_speaker_net(self.speaker_net, enroll_feats, train)
        return dvec.squeeze(-1)

    def _mask_and_decode(self, noisy_feats, dvec, train: bool = False):
        if dvec is not None:
            mask = self.masker(noisy_feats, dvec, train=train)
        else:
            mask = self.masker(noisy_feats, train=train)
        mask = get_mask(mask, self.mask_constraint)
        enh_feats = apply_tf_masks(noisy_feats, mask, mask_type=self.mask_type,
                                   f_type=self.f_type)
        enh_wav = self._decode(enh_feats)
        return wav_output_constrain(enh_wav, self.output_constraint)

    # -------------------------------------------------------------- forward
    def __call__(self, noisy, enroll=None, ref_clean=None, spk_class=None,
                 inactive_labels=None, alpha: float = 10.0,
                 return_loss_detail: bool = False, train: bool = True):
        task = self.task
        if task in (0, 4):
            return self._forward(noisy, enroll, ref_clean, inactive_labels, train)
        if task == 1:
            return self._forward_join(noisy, enroll, ref_clean, spk_class,
                                      alpha, return_loss_detail,
                                      inactive_labels, train)
        if task == 2:
            return self._forward_contrastive(noisy, enroll, spk_class, train)
        if task == 3:
            return self._forward_join_loop(noisy, enroll, ref_clean, spk_class,
                                           alpha, return_loss_detail,
                                           inactive_labels, train)
        raise NotImplementedError("wrapper constructed without loss functions")

    def _forward(self, noisy, enroll, ref_clean, inactive_labels, train):
        noisy_feats = self._encode_mix(noisy)
        if enroll is not None:
            enroll_feats = self._encode_enroll(enroll, train)
            if not self.embedding_free_tse:
                dvec = self._dvec(enroll_feats, train)
            else:
                dvec = enroll_feats
        else:
            dvec = None
        enh_wav = self._mask_and_decode(noisy_feats, dvec, train)
        enh_wav, ref_clean = align_waveform(enh_wav, ref_clean)
        return self.loss_func_wav(enh_wav, ref_clean, inactive_labels)

    def _forward_join(self, noisy, enroll, ref_clean, spk_class, alpha,
                      return_loss_detail, inactive_labels, train):
        noisy_feats = self._encode_mix(noisy)
        enroll_feats = self._encode_enroll(enroll, train)
        dvec = self._dvec(enroll_feats, train)
        enh_wav = self._mask_and_decode(noisy_feats, dvec, train)
        enh_wav, ref_clean = align_waveform(enh_wav, ref_clean)
        loss_wav = self.loss_func_wav(enh_wav, ref_clean, inactive_labels)
        if self.loss_func_spk is not None and spk_class is not None:
            loss_spk = self.loss_func_spk(dvec, spk_class)
            if return_loss_detail:
                return loss_wav + alpha * loss_spk, (loss_wav, loss_spk)
            return loss_wav + alpha * loss_spk
        return loss_wav

    def _forward_contrastive(self, noisy, enroll, spk_class, train):
        noisy_feats = self._encode_mix(noisy)
        enroll_feats = self._encode_enroll(enroll, train)
        dvec = self._dvec(enroll_feats, train)
        enh_wav = self._mask_and_decode(noisy_feats, dvec, train)
        # the reference re-embeds the enhanced waveform through the MIXTURE
        # encoder (base_nn.py:574), not encoder_spk
        enh_feats = self._encode_mix(enh_wav)
        enh_dvec = self._dvec(enh_feats, train)
        N = dvec.shape[0]
        total = jnp.concatenate([dvec, enh_dvec], axis=-1).reshape(N * 2, -1)
        return self.loss_func_spk(total, None)

    def _forward_join_loop(self, noisy, enroll, ref_clean, spk_class, alpha,
                           return_loss_detail, inactive_labels, train):
        noisy_feats = self._encode_mix(noisy)
        enroll_feats = self._encode_enroll(enroll, train)
        dvec = self._dvec(enroll_feats, train)
        enh_wav = self._mask_and_decode(noisy_feats, dvec, train)
        pred_noise = noisy - enh_wav
        enh_dvec = self._dvec(self._encode_enroll(enh_wav, train), train)
        noise_dvec = self._dvec(self._encode_enroll(pred_noise, train), train)
        triplet = jnp.stack([dvec, enh_dvec, noise_dvec], axis=1)
        enh_wav_a, ref_clean = align_waveform(enh_wav, ref_clean)
        loss_wav = self.loss_func_wav(enh_wav_a, ref_clean, inactive_labels)
        if self.loss_func_spk is not None and spk_class is not None:
            loss_spk = self.loss_func_spk(dvec, spk_class)
            loss_loop = self.loss_func_others(triplet)
            total = loss_wav + alpha * loss_spk + (1 / alpha) * loss_loop
            if return_loss_detail:
                return total, (loss_wav, loss_spk, (1 / alpha) * loss_loop)
            return total
        return loss_wav

    # ------------------------------------------------------------ inference
    def inference(self, noisy, enroll=None):
        noisy_feats = self._encode_mix(noisy)
        dvec = None
        if enroll is not None:
            enroll_feats = self._encode_enroll(enroll, train=False)
            dvec = (enroll_feats if self.embedding_free_tse
                    else self._dvec(enroll_feats, train=False))
        return self._mask_and_decode(noisy_feats, dvec, train=False)

    def inference_tse_embedding(self, enroll):
        enroll_feats = self._encode_enroll(enroll, train=False)
        return _run_speaker_net(self.speaker_net, enroll_feats, False)


class SiMoTaskWrapModule(nn.Module):
    """Single-input multi-output wrapper (speech separation).

    Masker emits [N, M, C, T] masks; the mixture is repeated per source and
    flattened into the batch for mask-apply/decode (base_nn.py:902-958).
    """

    encoder: nn.Module
    masker: nn.Module
    loss_func_wav: Optional[Callable] = None
    f_type: str = "real"
    mask_type: str = "real"
    mask_constraint: str = "linear"
    output_constraint: str = "linear"
    drop_first_bin: bool = False

    def _is_stft_encoder(self) -> bool:
        return isinstance(self.encoder, ConvEncDec)

    def _encode(self, wav):
        feats = self.encoder(wav)
        if self._is_stft_encoder():
            re, im = feats[..., 0], feats[..., 1]
            if self.drop_first_bin:
                re, im = re[:, 1:, :], im[:, 1:, :]
            feats = jnp.concatenate([re, im], axis=1)
        return feats

    def _decode_multi(self, enh_feats):
        """[N, M, C, T] -> [N, M, L]."""
        N, M, C, T = enh_feats.shape
        flat = enh_feats.reshape(N * M, C, T)
        if self._is_stft_encoder():
            re, im = jnp.split(flat, 2, axis=1)
            if self.drop_first_bin:
                pad = jnp.zeros((re.shape[0], 1, T), re.dtype)
                re = jnp.concatenate([pad, re], axis=1)
                im = jnp.concatenate([pad, im], axis=1)
            flat = jnp.stack([re, im], axis=-1)
        wav = self.encoder.inverse(flat)
        return wav.reshape(N, M, -1)

    def _separate(self, noisy, train: bool):
        feats = self._encode(noisy)
        mask = self.masker(feats, train=train)  # [N, M, C, T]
        mask = get_mask(mask, self.mask_constraint)
        N, M, C, T = mask.shape
        rep = jnp.broadcast_to(feats[:, None], (N, M, C, T)).reshape(N * M, C, T)
        enh = apply_tf_masks(rep, mask.reshape(N * M, C, T),
                             mask_type=self.mask_type, f_type=self.f_type)
        enh_wav = self._decode_multi(enh.reshape(N, M, C, T))
        return wav_output_constrain(enh_wav, self.output_constraint)

    def __call__(self, noisy, ref_clean, inactive_labels=None,
                 train: bool = True):
        enh_wav = self._separate(noisy, train)
        # NOTE: the reference truncates enh to the ref length here
        # (base_nn.py:887), which is a no-op when enh is the shorter side;
        # truncating ref (as the SISO wrapper does) is used instead so
        # non-hop-aligned lengths also work. Identical when lengths align.
        enh_wav, ref_clean = align_waveform(enh_wav, ref_clean)
        N, M, L = enh_wav.shape
        # source-aggregated SDR losses need the [N, M, L] layout; plain
        # losses get the reference's flattened [N*M, L] (base_nn.py:935-937
        # — the reference always flattens, which makes its own
        # source-aggregated modes unusable from the SIMO wrapper)
        if getattr(self.loss_func_wav, "source_aggregated", False):
            inact = inactive_labels
            return self.loss_func_wav(enh_wav, ref_clean, inact)
        inact = (inactive_labels.reshape(-1)
                 if inactive_labels is not None else None)
        return self.loss_func_wav(enh_wav.reshape(N * M, -1),
                                  ref_clean.reshape(N * M, -1), inact)

    def inference(self, noisy):
        return self._separate(noisy, train=False)
