"""Native PESQ (src/pesq_native.py) validation.

No conformance vectors exist in this environment, so validation is
property-based plus the round-4 six-family calibration grids (white
noise at SNR, MNRU, band-limitation, muting, reverberation, codec-like —
scripts/calibrate_pesq.py): identity ceiling, monotonicity in
degradation, scale and delay invariance, mid-stream delay-jump
realignment, per-family anchors at +-0.15 (see pesq_native.py docstring
for residuals vs literature targets).
"""
import numpy as np
import pytest
from scipy.io import wavfile

from puresound_tpu.src.metrics import Metrics
from puresound_tpu.src.pesq_native import pesq

WAV = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"


@pytest.fixture(scope="module")
def speech():
    sr, wav = wavfile.read(WAV)
    x = wav.astype(np.float64) / 32768.0
    x = x[: sr * 6]
    return x / np.abs(x).max()


def _noisy(x, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    n *= np.sqrt(np.sum(x**2) / (np.sum(n**2) * 10 ** (snr_db / 10)))
    return x + n


def test_identity_ceiling(speech):
    assert pesq(16000, speech, speech, "wb") > 4.6
    assert pesq(8000, speech, speech, "nb") > 4.5


def test_monotone_in_noise(speech):
    wb = [pesq(16000, speech, _noisy(speech, s), "wb") for s in (40, 30, 20, 10, 0)]
    nb = [pesq(8000, speech, _noisy(speech, s), "nb") for s in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(wb, wb[1:])), wb
    assert all(a > b for a, b in zip(nb, nb[1:])), nb
    assert all(1.0 < v < 4.7 for v in wb + nb)


def _mnru(x, Q, seed=0):
    rng = np.random.default_rng(seed)
    return x * (1 + 10 ** (-Q / 20) * rng.standard_normal(len(x)))


def _lowpass(x, cutoff, fs):
    from scipy.signal import butter, lfilter

    b, a = butter(6, cutoff / (fs / 2))
    return lfilter(b, a, x)


def test_calibration_anchors_white_noise(speech):
    """White-noise SNR grid vs the round-3 joint calibration
    (scripts/calibrate_pesq.py; values are the fit's achieved scores,
    asserted at +-0.15 as a regression freeze — the fit itself sits within
    ~0.2 (wb) / ~0.35 (nb) of the literature-informed targets)."""
    wb = {40: 3.67, 30: 3.20, 20: 2.60, 10: 1.81, 0: 1.23}
    nb = {40: 3.70, 30: 3.23, 20: 2.55, 10: 1.79, 0: 1.42}
    for snr, tgt in wb.items():
        got = pesq(16000, speech, _noisy(speech, snr), "wb")
        assert abs(got - tgt) < 0.15, ("wb", snr, got, tgt)
    for snr, tgt in nb.items():
        got = pesq(8000, speech, _noisy(speech, snr), "nb")
        assert abs(got - tgt) < 0.15, ("nb", snr, got, tgt)


def test_calibration_anchors_mnru(speech):
    """MNRU (P.862's reference degradation family): modulated noise at Q dB."""
    wb = {35: 3.73, 25: 3.16, 15: 2.39}
    nb = {35: 3.70, 25: 3.06, 15: 2.15}
    for Q, tgt in wb.items():
        got = pesq(16000, speech, _mnru(speech, Q), "wb")
        assert abs(got - tgt) < 0.15, ("wb", Q, got, tgt)
    for Q, tgt in nb.items():
        got = pesq(8000, speech, _mnru(speech, Q), "nb")
        assert abs(got - tgt) < 0.15, ("nb", Q, got, tgt)


def test_calibration_anchors_band_limitation(speech):
    """Band-limitation must be penalized (round 2 scored 2 kHz-lowpassed
    speech 4.6) and scores must fall with the cutoff; depth beyond the
    P.862 0.01 frequency-compensation floor saturates, so the spacing is
    compressed vs true WB-PESQ (documented in pesq_native.py)."""
    wb = {3400: 2.98, 2000: 2.82, 1000: 2.73}
    got = {c: pesq(16000, speech, _lowpass(speech, c, 16000), "wb")
           for c in wb}
    for c, tgt in wb.items():
        assert abs(got[c] - tgt) < 0.15, ("wb", c, got[c], tgt)
    assert got[1000] < got[2000] < got[3400]


def _reverb(x, t60, fs, seed=0):
    rng = np.random.default_rng(seed)
    L = int(t60 * fs)
    env = np.exp(-3.0 * np.log(10) * np.arange(L) / L)
    tail = rng.standard_normal(L) * env
    drr = 10.0 - 11.0 * t60
    g = np.sqrt(10 ** (-drr / 10.0) / np.sum(env ** 2))
    h = np.concatenate([[1.0], g * tail])
    y = np.convolve(x, h)[: len(x)]
    return y / (np.abs(y).max() + 1e-12) * np.abs(x).max()


def _ulaw(x, bits=8, mu=255.0):
    c = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.round(c * (2 ** (bits - 1) - 1)) / (2 ** (bits - 1) - 1)
    return np.sign(q) * (np.expm1(np.abs(q) * np.log1p(mu))) / mu


def test_calibration_anchors_reverb_codec(speech):
    """Round-4 families: reverberation (exponential RIR at realistic DRR)
    and codec-like distortion (mu-law companding, bit-crush). Frozen at
    the round-4 joint calibration's achieved scores (+-0.15); the fit's
    residuals vs literature targets are documented in pesq_native.py
    (rms 0.182 wb / 0.157 nb across all six families)."""
    wb_rev = {0.3: 2.86, 0.6: 2.40, 1.0: 2.03}
    for t60, tgt in wb_rev.items():
        got = pesq(16000, speech, _reverb(speech, t60, 16000), "wb")
        assert abs(got - tgt) < 0.15, ("rev", t60, got, tgt)
    assert abs(pesq(16000, speech, _ulaw(speech), "wb") - 3.85) < 0.15
    s = 2 ** 5 - 1
    crushed = np.round(speech * s) / s
    assert abs(pesq(16000, speech, crushed, "wb") - 2.64) < 0.15
    # muting stays calibrated (round-3's worst family, off by ~0.5)
    mask = np.where((np.arange(len(speech)) % 16000) < 0.8 * 16000, 1.0, 0.0)
    assert abs(pesq(16000, speech, speech * mask, "wb") - 1.70) < 0.15


def test_scale_invariance(speech):
    deg = _noisy(speech, 20)
    a = pesq(16000, speech, deg, "wb")
    b = pesq(16000, speech, 3.7 * deg, "wb")
    c = pesq(16000, 0.25 * speech, deg, "wb")
    assert abs(a - b) < 1e-6
    assert abs(a - c) < 1e-6


def test_delay_invariance(speech):
    delayed = np.concatenate([np.zeros(800), speech])[: len(speech)]
    assert pesq(16000, speech, delayed, "wb") > 4.5
    neg = speech[800:]
    assert pesq(16000, speech, neg, "wb") > 4.4


def test_mid_stream_delay_jump_mostly_realigned(speech):
    """P.862's utterance splitting charges a mid-stream delay CHANGE
    (VoIP jitter) as alignment, not distortion: a 20 ms jump halfway
    through must score far above what raw misalignment would give
    (~1.5) and well above harsh degradations — only the ~300 ms around
    the jump (recursive-split resolution) keeps a residual penalty."""
    drift = speech.copy()
    half, shift = len(speech) // 2, int(0.020 * 16000)
    drift[half:] = speech[half - shift:len(speech) - shift]
    s = pesq(16000, speech, drift, "wb")
    assert s > 2.5, s
    # and worse than clean: the jump region residual IS audible
    assert s < pesq(16000, speech, speech.copy(), "wb")


def test_degradations_rank_sensibly(speech):
    clip_scores = [pesq(16000, speech, np.clip(speech, -c, c), "wb")
                   for c in (0.5, 0.2, 0.05)]
    assert all(a > b for a, b in zip(clip_scores, clip_scores[1:]))
    assert clip_scores[-1] < 2.5
    # muting one fifth of the signal is clearly audible
    mask = np.where(np.arange(len(speech)) % 16000 > 12800, 0.0, 1.0)
    assert pesq(16000, speech, speech * mask, "wb") < 3.0


def test_errors():
    x = np.zeros(1000)
    with pytest.raises(ValueError):
        pesq(16000, x, x, "wb")  # too short
    y = np.random.default_rng(0).standard_normal(16000 * 2)
    with pytest.raises(ValueError):
        pesq(8000, y, y, "wb")  # wrong fs for wb
    with pytest.raises(ValueError):
        pesq(16000, y, y, "xx")


def test_metrics_facade(speech):
    """Metrics.pesq_wb/nb now compute without the pesq package (the round-1
    capability gap)."""
    deg = _noisy(speech, 15)
    wb = Metrics.pesq_wb(speech, deg)
    nb = Metrics.pesq_nb(speech, deg)
    assert 1.0 < wb < 3.2
    assert 1.0 < nb < 3.5
