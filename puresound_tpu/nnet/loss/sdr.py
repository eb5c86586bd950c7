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
    # compat=True reproduces the reference's source-aggregated quirk
    # (loss/sdr.py:97-101 upstream): target_norm is [N, M, 1] (keepdims)
    # and the "aggregation" sums axis=-1 — the size-1 axis — so sasdr/
    # sasisnr/satsdr never actually aggregate over sources there.
    # compat=False (default) is the real SA-SDR (2110.15581): power summed
    # over the source axis M before the log, one ratio per mixture.
    compat: bool = False

    @classmethod
    def init_mode(cls, loss_func: str = "sisnr", reduction: bool = True,
                  threshold: Optional[float] = None,
                  compat: bool = False) -> "SDRLoss":
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
                   threshold=threshold, compat=compat)

    def _norms(self, s1, s2):
        """Per-signal target/noise power terms, [..., 1] (keepdims)."""
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
        return target_norm, noise_norm

    def _batch_snr(self, s1, s2):
        """Per-item negative SNR, [..., 1]."""
        target_norm, noise_norm = self._norms(s1, s2)
        if not self.source_aggregated:
            snr = 10 * jnp.log10(target_norm / (noise_norm + self.eps) + self.eps)
        else:
            # compat path: the reference's no-op "aggregation" over the
            # size-1 keepdim axis (see `compat` field docstring)
            snr = 10 * jnp.log10(jnp.sum(target_norm, axis=-1)
                                 / (jnp.sum(noise_norm, axis=-1) + self.eps)
                                 + self.eps)
        return -snr

    def _sa_call(self, s1, s2, inactive_labels):
        """True SA-SDR: one ratio per mixture, power summed over ACTIVE
        sources; inactive sources score the energy-suppression loss and
        join the same masked mean (one term per mixture + one per
        inactive source)."""
        N, M, L = s1.shape
        target_norm, noise_norm = self._norms(s1, s2)  # [N, M, 1]
        target_norm = target_norm[..., 0]
        noise_norm = noise_norm[..., 0]
        if inactive_labels is None:
            act = jnp.ones((N, M), bool)
        else:
            act = ~inactive_labels.reshape(N, M).astype(bool)
        T = jnp.sum(jnp.where(act, target_norm, 0.0), axis=1)  # [N]
        Nn = jnp.sum(jnp.where(act, noise_norm, 0.0), axis=1)
        snr = -10 * jnp.log10(T / (Nn + self.eps) + self.eps)  # neg, [N]
        has_active = jnp.any(act, axis=1)

        inact = inactive_sdr_loss(s1.reshape(N * M, L), s2.reshape(N * M, L),
                                  reduction=False).reshape(N, M)
        if self.threshold is not None:
            keep = has_active & (snr > self.threshold)
            keep = jnp.where(jnp.any(keep), keep, has_active)
        else:
            keep = has_active
        total = (jnp.sum(jnp.where(keep, snr, 0.0))
                 + jnp.sum(jnp.where(~act, inact, 0.0)))
        count = jnp.sum(keep) + jnp.sum(~act)
        if self.reduction:
            return total / jnp.maximum(count, 1)
        # non-reduced: per-mixture values (fully-inactive mixtures fall
        # back to the mean of their sources' energy losses)
        return jnp.where(has_active, snr, jnp.mean(inact, axis=1))

    def __call__(self, s1: jnp.ndarray, s2: jnp.ndarray,
                 inactive_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """s1: estimate, s2: reference; [N, L] (or [N, M, L] when
        source_aggregated, with inactive_labels [N, M])."""
        if self.source_aggregated:
            assert s1.ndim == 3, "source_aggregated expects [N, M, L]"
            if not self.compat:
                return self._sa_call(s1, s2, inactive_labels)
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
