"""End-to-end trained-quality gates on REAL audio (round-4 verdict item 4).

The reference ships trained-model results (egs/ns/README.md:17-20,
egs/tse/README.md:48-76) as its "training produces a working model"
evidence; datasets aren't available here, so the equivalent gate is an
overfit run on mixtures built from the reference's own test audio
(/root/reference/test/test_case/*): train through the REAL stack (Task +
DataLoader + manifests + multi_gpu CPU mesh) and assert the quality
metrics clear fixed thresholds.

Runs in SUBPROCESSES (with os._exit(0) after success): in-process these
are the heaviest tests in the suite and running them after ~259 others
aborts the interpreter (the accumulated XLA-CPU state class also hit by
the NS multi_gpu CLI test); isolation keeps both the gates and the suite
stable.

Thresholds were calibrated by scripts/exp_trained_quality.py (margins are
roughly half the observed improvement):
- NS (DPCRN small, 40 epochs / 80 steps): observed SI-SNRi +9.8 dB,
  STOI 0.728 -> 0.833, PESQ 1.27 -> 2.33.
- TSE (SkiM + speaker net, 50 epochs): observed SI-SNRi +8.8 dB by
  epoch 40, +11.5 by 60.
- DSS (DPARN_Mout SIMO, 150 epochs, round 5): near +5.3 / far +4.3 dB
  SI-SNRi, sasisnr loss 6.33 -> -5.31.
- PVAD (SkiM vad head, 200 epochs, round 5): binarized F1 0.88
  (structural cap, see the test), raw F1 0.98+.

All 4 task families (NS / TSE / DSS / PVAD) now have trained-model
evidence. Marked slow: ~12 min total on the 1-core CI host.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "scripts", "exp_trained_quality.py")


def _run_gate(which: str, epochs: int, tmp_path) -> dict:
    driver = (
        "import os, sys, json, importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('tq', {_SCRIPT!r})\n"
        "tq = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(tq)\n"
        f"fn = tq.run_{which}\n"
        f"m = fn(epochs={epochs}, tmp={str(tmp_path)!r}, verbose=False)\n"
        "print('GATE_RESULT ' + json.dumps({k: float(v) for k, v in m.items()}))\n"
        "sys.stdout.flush(); os._exit(0)\n")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", driver], capture_output=True,
                       text=True, timeout=1800, cwd=_REPO, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("GATE_RESULT ")]
    assert line, r.stdout[-2000:]
    return json.loads(line[-1][len("GATE_RESULT "):])


def test_ns_training_improves_quality_on_real_audio(tmp_path):
    """DPCRN trained on real speech + filtered noise through NsTask
    (multi_gpu mesh): denoised output must clearly beat the noisy input
    on SI-SNR, STOI, and native PESQ."""
    m = _run_gate("ns", 40, tmp_path)
    assert m["sisnr"] - m["base_sisnr"] > 5.0, m
    assert m["stoi"] - m["base_stoi"] > 0.04, m
    assert m["pesq"] - m["base_pesq"] > 0.4, m


def test_tse_training_improves_sisnr_on_real_speech_mixtures(tmp_path):
    """SkiM TSE (speaker net + FiLM conditioning) trained on real
    two-speaker mixtures through TseTask (multi_gpu mesh): extracting the
    enrolled speaker must clearly beat the mixture SI-SNR."""
    m = _run_gate("tse", 50, tmp_path)
    assert m["sisnr"] - m["base_sisnr"] > 5.0, m


def test_dss_training_separates_near_far_sources(tmp_path):
    """DPARN_Mout SIMO near/far separation trained through DssTask with
    the source-aggregated SI-SNR loss (multi_gpu mesh): each separated
    source must clearly beat the mixture baseline, and the sasisnr loss
    must improve (ref puresound/task/dss.py:241-342 is the runtime; the
    reference ships no DSS recipe/results, so the overfit IS the
    trained-model evidence)."""
    m = _run_gate("dss", 150, tmp_path)
    # calibrated (scripts/exp_trained_quality.py dss 150, ~3 min): near
    # +5.3 / far +4.3 dB, loss 6.33 -> -5.31; margins ~half the observed
    assert m["near_sisnr"] - m["base_near_sisnr"] > 2.5, m
    assert m["far_sisnr"] - m["base_far_sisnr"] > 2.0, m
    assert m["loss"] < m["first_loss"] - 5.0, m


def test_pvad_training_reaches_usable_f1_after_binarize(tmp_path):
    """Personal-VAD (SkiM + Sigmoid head + soft-F1 loss) trained through
    TseTask on is_vad_dataset manifests: F1 after the Binarize
    post-processor must clear the gate and beat the untrained model
    (ref egs/tse/main.py:190-223 scores dev exactly this way)."""
    m = _run_gate("pvad", 200, tmp_path)
    # calibrated (scripts/exp_trained_quality.py pvad 250, ~100 s):
    # binarized F1 0.88 / raw F1 0.98-0.995 by ep 200. The binarized F1
    # is structurally capped near 0.88: the 0.2 s moving-average smears
    # the hard label edges (~0.1 s per edge). An always-active predictor
    # scores F1 ~0.75 but accuracy ~0.6 on these labels — the accuracy
    # gate rules that degenerate solution out.
    assert m["f1"] > 0.82, m
    assert m["accuracy"] > 0.80, m
    assert m["raw_f1"] > 0.92, m
