"""SDR loss family: SI-SNR / SD-SDR / SDR / t-SDR / source-aggregated, with
inactive-source handling and hard-threshold keeps.

Parity: puresound/nnet/loss/sdr.py (SDRLoss :7, si_snr :263,
inactive_sdr_loss :302).

TPU-first: the reference splits the batch by inactive labels (data-dependent
shapes, sdr.py:124-137); here both branches are computed for every item and
combined with masked means, so the whole loss stays jittable with static
shapes and identical values.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp


def l2_norm(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """<s1, s2> over the last axis, keepdims (the reference's || ||^2)."""
    return jnp.sum(s1 * s2, axis=-1, keepdims=True)


def _zero_mean(s):
    return s - jnp.mean(s, axis=-1, keepdims=True)


def inactive_sdr_loss(s1: jnp.ndarray, s2: jnp.ndarray,
                      reduction: bool = True) -> jnp.ndarray:
    """Energy-suppression loss for inactive targets:
    10*log10(||enh||^2 + 0.01*||mix||^2)."""
    s1 = _zero_mean(s1)
    s2 = _zero_mean(s2)
    val = 10 * jnp.log10(l2_norm(s1, s1) + 0.01 * l2_norm(s2, s2) + 1e-8)
    return jnp.mean(val) if reduction else val


def si_snr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8,
           reduction: bool = True) -> jnp.ndarray:
    """SI-SNR metric (s1 = estimate, s2 = reference), in dB."""
    s1 = _zero_mean(s1)
    s2 = _zero_mean(s2)
    s_target = l2_norm(s1, s2) / (l2_norm(s2, s2) + eps) * s2
    e_noise = s1 - s_target
    snr = 10 * jnp.log10(l2_norm(s_target, s_target) / (l2_norm(e_noise, e_noise) + eps) + eps)
    return jnp.mean(snr) if reduction else snr


@dataclass(frozen=True)
class SDRLoss:
    """Configurable negative-SDR training loss (callable)."""

    scaled: bool = True
    scale_dependent: bool = False
    zero_mean: bool = True
    source_aggregated: bool = False
    sdr_max: Optional[int] = None
    eps: float = 1e-8
    reduction: bool = True
    threshold: Optional[float] = None

    @classmethod
    def init_mode(cls, loss_func: str = "sisnr", reduction: bool = True,
                  threshold: Optional[float] = None) -> "SDRLoss":
        loss_func = loss_func.lower()
        if loss_func not in ("sisnr", "sdsdr", "sdr", "tsdr", "sasdr",
                             "sasisnr", "satsdr"):
            raise NameError(loss_func)
        # NOTE: reproduces the reference's alias logic exactly, including its
        # substring check (`loss_func in "sdsdr"`, sdr.py:72) which makes
        # "sdr" scaled and leaves "sasisnr" UNscaled (the reference compares
        # against the typo "sasisdr").
        scaled = loss_func in ("sisnr", "sdsdr", "sdr")
        scale_dependent = loss_func == "sdsdr"
        source_aggregated = loss_func in ("sasdr", "sasisnr", "satsdr")
        sdr_max = 30 if loss_func in ("tsdr", "satsdr") else None
        return cls(scaled=scaled, scale_dependent=scale_dependent,
                   zero_mean=True, source_aggregated=source_aggregated,
                   sdr_max=sdr_max, eps=1e-8, reduction=reduction,
                   threshold=threshold)

    def _batch_snr(self, s1, s2):
        """Per-item negative SNR, [..., 1]."""
        if self.zero_mean:
            s1 = _zero_mean(s1)
            s2 = _zero_mean(s2)
        if self.scaled:
            s_target = l2_norm(s1, s2) / (l2_norm(s2, s2) + self.eps) * s2
        else:
            s_target = s2
        e_noise = (s1 - s_target) if not self.scale_dependent else (s1 - s2)
        target_norm = l2_norm(s_target, s_target)
        noise_norm = l2_norm(e_noise, e_noise)
        if self.sdr_max is not None:
            tau = 10 ** (-self.sdr_max / 10)
            noise_norm = noise_norm + tau * target_norm
        if not self.source_aggregated:
            snr = 10 * jnp.log10(target_norm / (noise_norm + self.eps) + self.eps)
        else:
            snr = 10 * jnp.log10(jnp.sum(target_norm, axis=-1)
                                 / (jnp.sum(noise_norm, axis=-1) + self.eps)
                                 + self.eps)
        return -snr

    def __call__(self, s1: jnp.ndarray, s2: jnp.ndarray,
                 inactive_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """s1: estimate, s2: reference; [N, L] (or [N, M, L] when
        source_aggregated). inactive_labels: bool [N]."""
        if self.source_aggregated:
            assert s1.ndim == 3, "source_aggregated expects [N, M, L]"
        else:
            assert s1.ndim == 2, "expects [N, L]"

        snr = self._batch_snr(s1, s2).reshape(-1)  # [N]

        if inactive_labels is None:
            active_mask = jnp.ones_like(snr, dtype=bool)
            inact = jnp.zeros_like(snr)
            inactive_mask = jnp.zeros_like(snr, dtype=bool)
        else:
            inactive_mask = inactive_labels.reshape(-1).astype(bool)
            active_mask = ~inactive_mask
            # per-item inactive loss at the same granularity as snr
            # ([N] for 2-D inputs, [N*M] for source-aggregated 3-D inputs)
            s1f = s1.reshape(-1, s1.shape[-1])
            s2f = s2.reshape(-1, s2.shape[-1])
            inact = inactive_sdr_loss(s1f, s2f, reduction=False).reshape(-1)

        if self.threshold is not None:
            # keep active items with loss above the threshold; if none
            # qualify, keep all active items (reference sdr.py:173-177)
            keep = active_mask & (snr > self.threshold)
            keep = jnp.where(jnp.any(keep), keep, active_mask)
        else:
            keep = active_mask

        total = jnp.sum(jnp.where(keep, snr, 0.0)) + jnp.sum(jnp.where(inactive_mask, inact, 0.0))
        count = jnp.sum(keep) + jnp.sum(inactive_mask)
        if self.reduction:
            return total / jnp.maximum(count, 1)
        # non-reduced: per-item values (active -> snr, inactive -> inact)
        return jnp.where(inactive_mask, inact, snr)


def attenuation_ratio(s1: jnp.ndarray, s2: jnp.ndarray, mask: jnp.ndarray,
                      reduction: bool = True) -> jnp.ndarray:
    """Suppression level on non-target regions (mask == 0), in dB.

    s1: enhanced [N, L], s2: noisy [N, L], mask: [N, L] target-activity.
    """
    sel = (mask == 0).astype(s1.dtype)
    num = jnp.sum((s2 * sel) ** 2, axis=-1)
    den = jnp.sum((s1 * sel) ** 2, axis=-1)
    score = 10 * jnp.log10(num / jnp.maximum(den, 1e-12))
    return jnp.mean(score) if reduction else score
