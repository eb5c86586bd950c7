"""Sinc/Blackman FIR filters + spectral/time dropout augmentations.

Parity: puresound/src/filter.py (lowpass :10, bandpass :29, notch :49,
wav_drop_frequency :86, wav_drop_chunk :124).
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np

from .utils import fftconvolve


class Filter:
    @staticmethod
    def low_pass_filter(cutoff: float, sr: int = 16000, taps: int = 101) -> np.ndarray:
        """Windowed-sinc lowpass FIR (Blackman window)."""
        fc = cutoff / sr
        n = np.arange(taps) - (taps - 1) / 2
        h = np.sinc(2 * fc * n)
        win = np.blackman(taps)
        h = h * win
        return (h / np.sum(h)).astype(np.float32)

    @staticmethod
    def band_pass_filter(low_cut: float, high_cut: float, sr: int = 16000,
                         taps: int = 101) -> np.ndarray:
        lp_high = Filter.low_pass_filter(high_cut, sr, taps)
        hp = -Filter.low_pass_filter(low_cut, sr, taps)
        hp[(taps - 1) // 2] += 1
        bp = np.convolve(lp_high, hp)[taps // 2 : taps // 2 + taps]
        return bp.astype(np.float32)

    @staticmethod
    def notch_filter(notch_freq: float, sr: int = 16000, taps: int = 101,
                     band_width: float = 100.0) -> np.ndarray:
        low = notch_freq - band_width / 2
        high = notch_freq + band_width / 2
        bp = Filter.band_pass_filter(low, high, sr, taps)
        notch = -bp
        notch[(taps - 1) // 2] += 1
        return notch.astype(np.float32)

    @staticmethod
    def wav_drop_frequency(wav: np.ndarray, sr: int = 16000,
                           drop_freq: Optional[float] = None,
                           band_width: float = 100.0,
                           taps: int = 101) -> np.ndarray:
        """Notch out a random (or given) frequency band."""
        if drop_freq is None:
            drop_freq = random.uniform(100, sr / 2 - 200)
        h = Filter.notch_filter(drop_freq, sr, taps, band_width)
        out = fftconvolve(wav, h.reshape(1, -1), mode="same")
        return out.astype(np.float32)

    @staticmethod
    def wav_drop_chunk(wav: np.ndarray, sr: int = 16000,
                       drop_start: Optional[int] = None,
                       drop_length_s: float = 0.1) -> np.ndarray:
        """Zero out a random (or given) time chunk."""
        L = wav.shape[-1]
        n = int(sr * drop_length_s)
        if drop_start is None:
            drop_start = random.randint(0, max(L - n, 0))
        out = wav.copy()
        out[..., drop_start : drop_start + n] = 0.0
        return out
