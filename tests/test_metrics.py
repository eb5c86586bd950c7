"""Metrics facade tests (puresound/src/metrics.py parity surface)."""
import numpy as np

from puresound_tpu.src.metrics import Metrics


def test_check_shape_zero_signal_no_nan():
    """All-zero signals (PVAD inactive targets, fully-suppressed outputs)
    must not produce NaN through the peak normalization."""
    zeros = np.zeros(1600, np.float32)
    tone = np.sin(2 * np.pi * 440 * np.arange(1600) / 16000).astype(np.float32)
    c, e = Metrics.check_shape(zeros, tone)
    assert np.isfinite(c).all() and np.isfinite(e).all()
    c, e = Metrics.check_shape(tone, zeros)
    assert np.isfinite(c).all() and np.isfinite(e).all()
    c, e = Metrics.check_shape(zeros, zeros)
    assert np.isfinite(c).all() and np.isfinite(e).all()
    # f1_score on a zero prediction should also stay finite
    out = Metrics.f1_score((tone > 0).astype(np.float32), zeros)
    assert all(np.isfinite(v) for v in out.values())


def test_check_shape_alignment():
    a = np.ones((1, 1000), np.float32)
    b = 0.5 * np.ones((1, 900), np.float32)
    c, e = Metrics.check_shape(a, b)
    assert c.shape == e.shape == (900,)
    assert np.abs(c).max() == 1.0 and np.abs(e).max() == 1.0


def test_sisnr_identity_high():
    x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    assert Metrics.sisnr(x, x) > 50.0
    noisy = x + 0.1 * np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    assert Metrics.sisnr(x, noisy) < Metrics.sisnr(x, x)
    assert Metrics.sisnr_imp(x, x, noisy) > 0.0
