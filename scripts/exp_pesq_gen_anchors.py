"""Regenerate tests/test_pesq.py anchor values under the current model.

nb anchors are generated WITHOUT the round-4 declared-fs quirk: the 16 kHz
test speech is properly resampled to 8 kHz (resample_poly) and scored with
pesq(8000, ...).

Run: python scripts/exp_pesq_gen_anchors.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile
from scipy.signal import butter, lfilter, resample_poly

from puresound_tpu.src.pesq_native import pesq

WAV = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"
sr, wav = wavfile.read(WAV)
x = wav.astype(np.float64) / 32768.0
x = x[: sr * 6]
x /= np.abs(x).max()
x8 = resample_poly(x, 1, 2)


def noisy(sig, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(sig))
    n *= np.sqrt(np.sum(sig ** 2) / (np.sum(n ** 2) * 10 ** (snr_db / 10)))
    return sig + n


def mnru(sig, Q, seed=0):
    rng = np.random.default_rng(seed)
    return sig * (1 + 10 ** (-Q / 20) * rng.standard_normal(len(sig)))


def lowpass(sig, cutoff, fs):
    b, a = butter(6, cutoff / (fs / 2))
    return lfilter(b, a, sig)


def reverb(sig, t60, fs, seed=0):
    rng = np.random.default_rng(seed)
    L = int(t60 * fs)
    env = np.exp(-3.0 * np.log(10) * np.arange(L) / L)
    tail = rng.standard_normal(L) * env
    drr = 10.0 - 11.0 * t60
    g = np.sqrt(10 ** (-drr / 10.0) / np.sum(env ** 2))
    h = np.concatenate([[1.0], g * tail])
    y = np.convolve(sig, h)[: len(sig)]
    return y / (np.abs(y).max() + 1e-12) * np.abs(sig).max()


def ulaw(sig, bits=8, mu=255.0):
    c = np.sign(sig) * np.log1p(mu * np.abs(sig)) / np.log1p(mu)
    q = np.round(c * (2 ** (bits - 1) - 1)) / (2 ** (bits - 1) - 1)
    return np.sign(q) * (np.expm1(np.abs(q) * np.log1p(mu))) / mu


print("wb noise:", {s: round(pesq(16000, x, noisy(x, s), "wb"), 2)
                    for s in (40, 30, 20, 10, 0)})
print("nb noise:", {s: round(pesq(8000, x8, noisy(x8, s), "nb"), 2)
                    for s in (40, 30, 20, 10, 0)})
print("wb mnru:", {q: round(pesq(16000, x, mnru(x, q), "wb"), 2)
                   for q in (35, 25, 15)})
print("nb mnru:", {q: round(pesq(8000, x8, mnru(x8, q), "nb"), 2)
                   for q in (35, 25, 15)})
print("wb lp:", {c: round(pesq(16000, x, lowpass(x, c, 16000), "wb"), 2)
                 for c in (3400, 2000, 1000)})
print("nb lp:", {c: round(pesq(8000, x8, lowpass(x8, c, 8000), "nb"), 2)
                 for c in (1700, 1000)})
print("wb rev:", {t: round(pesq(16000, x, reverb(x, t, 16000), "wb"), 2)
                  for t in (0.3, 0.6, 1.0)})
print("wb ulaw8:", round(pesq(16000, x, ulaw(x), "wb"), 2))
s = 2 ** 5 - 1
print("wb crush6:", round(pesq(16000, x, np.round(x * s) / s, "wb"), 2))
mask = np.where((np.arange(len(x)) % 16000) < 0.8 * 16000, 1.0, 0.0)
print("wb mute20:", round(pesq(16000, x, x * mask, "wb"), 2))
print("wb identity:", round(pesq(16000, x, x, "wb"), 2))
print("nb identity:", round(pesq(8000, x8, x8, "nb"), 2))
