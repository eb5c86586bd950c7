"""Native PESQ (src/pesq_native.py) validation.

No conformance vectors exist in this environment, so validation is
property-based plus the round-3 multi-family calibration grids (white
noise at SNR, MNRU, band-limitation — scripts/calibrate_pesq.py):
identity ceiling, monotonicity in degradation, scale and delay
invariance, per-family anchors at +-0.15 (see pesq_native.py docstring
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
    wb = {40: 3.62, 30: 3.08, 20: 2.40, 10: 1.70, 0: 1.28}
    nb = {40: 3.53, 30: 3.10, 20: 2.55, 10: 1.85, 0: 1.43}
    for snr, tgt in wb.items():
        got = pesq(16000, speech, _noisy(speech, snr), "wb")
        assert abs(got - tgt) < 0.15, ("wb", snr, got, tgt)
    for snr, tgt in nb.items():
        got = pesq(8000, speech, _noisy(speech, snr), "nb")
        assert abs(got - tgt) < 0.15, ("nb", snr, got, tgt)


def test_calibration_anchors_mnru(speech):
    """MNRU (P.862's reference degradation family): modulated noise at Q dB."""
    wb = {35: 3.69, 25: 3.03, 15: 2.19}
    nb = {35: 3.52, 25: 2.96, 15: 2.20}
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
    wb = {3400: 2.84, 2000: 2.65, 1000: 2.55}
    got = {c: pesq(16000, speech, _lowpass(speech, c, 16000), "wb")
           for c in wb}
    for c, tgt in wb.items():
        assert abs(got[c] - tgt) < 0.15, ("wb", c, got[c], tgt)
    assert got[1000] < got[2000] < got[3400]


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
