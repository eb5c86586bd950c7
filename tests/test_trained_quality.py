"""End-to-end trained-quality gates on REAL audio (round-4 verdict item 4).

The reference ships trained-model results (egs/ns/README.md:17-20,
egs/tse/README.md:48-76) as its "training produces a working model"
evidence; datasets aren't available here, so the equivalent gate is an
overfit run on mixtures built from the reference's own test audio
(/root/reference/test/test_case/*): train through the REAL stack (Task +
DataLoader + manifests + multi_gpu CPU mesh) and assert the quality
metrics clear fixed thresholds.

Thresholds were calibrated by scripts/exp_trained_quality.py (margins are
roughly half the observed improvement):
- NS (DPCRN small, 40 epochs / 80 steps): observed SI-SNRi +9.8 dB,
  STOI 0.728 -> 0.833, PESQ 1.27 -> 2.33.
- TSE (SkiM + speaker net, 60 epochs / 90 steps): observed SI-SNRi
  +11.5 dB (+8.8 by epoch 40).

Marked slow: ~3.5 min total on the 1-core CI host.
"""
import importlib.util
import os

import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "exp_trained_quality.py")
_spec = importlib.util.spec_from_file_location("exp_trained_quality", _SCRIPT)
tq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tq)

pytestmark = pytest.mark.slow


def test_ns_training_improves_quality_on_real_audio(tmp_path):
    """DPCRN trained on real speech + filtered noise through NsTask
    (multi_gpu mesh): denoised output must clearly beat the noisy input
    on SI-SNR, STOI, and native PESQ."""
    m = tq.run_ns(epochs=40, tmp=str(tmp_path), verbose=False)
    sisnri = m["sisnr"] - m["base_sisnr"]
    assert sisnri > 5.0, m
    assert m["stoi"] - m["base_stoi"] > 0.04, m
    assert m["pesq"] - m["base_pesq"] > 0.4, m


def test_tse_training_improves_sisnr_on_real_speech_mixtures(tmp_path):
    """SkiM TSE (speaker net + FiLM conditioning) trained on real
    two-speaker mixtures through TseTask (multi_gpu mesh): extracting the
    enrolled speaker must clearly beat the mixture SI-SNR."""
    m = tq.run_tse(epochs=50, tmp=str(tmp_path), verbose=False)
    sisnri = m["sisnr"] - m["base_sisnr"]
    assert sisnri > 5.0, m
