"""bench.py TPU compile-health probe.

The tunneled TPU backend can be in a state where jax.devices() succeeds
but any uncached compile hangs forever (see docs/BENCHMARKS.md,
methodology notes). bench.main() probes a fresh-shape compile in a
subprocess with a hard timeout before initializing its own backend;
these tests pin the probe's contract so the driver's end-of-round bench
can never hang indefinitely on a dead compile service.
"""
import bench


def test_probe_timeout_reports_unhealthy():
    # a ~0 timeout must come back ok=False quickly with an explanatory
    # note, never raise or block
    ok, dt, note = bench._tpu_compile_healthy(timeout_s=0.5, platform="cpu")
    assert ok is False
    assert dt < 30.0
    assert "unresponsive" in note


def test_probe_succeeds_on_cpu():
    ok, dt, note = bench._tpu_compile_healthy(timeout_s=120.0,
                                              platform="cpu")
    assert ok is True, note
    assert note is None  # fast compile -> no DEGRADED warning


def test_emit_result_line_is_compact_and_parseable(tmp_path, capsys):
    """Round-4 regression: the one-line JSON grew to ~10 KB and the driver
    (which keeps only a ~2000-char tail of the last line) recorded
    `parsed: null`. The emitted line must parse, stay under LINE_BUDGET,
    and carry the headline + per-family summary; the full detail goes to
    the bench_detail.json sidecar."""
    import json
    import os

    # frozen snapshot of the round-4 full-run detail (the shape that broke
    # the r4 driver parse) — a committed fixture, NOT .bench_partial.json,
    # which any smoke/partial run overwrites with different sections
    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "bench_detail_r4.json")
    with open(fixture) as f:
        detail = json.load(f)
    out = {"metric": "concurrent_16khz_streaming_tse_streams_per_chip",
           "value": 29696.0, "unit": "streams", "vs_baseline": 59.392}
    line = bench.emit_result(dict(out), detail, repo_dir=str(tmp_path))
    assert line == capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= bench.LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 29696.0
    assert parsed["vs_baseline"] == 59.392
    s = parsed["summary"]
    assert s["tse_streams"] == 29696.0
    assert s["ns_streams"] == detail["ns_streams_per_chip"]
    assert s["dparn_streams"] == detail["dparn_streams_per_chip"]
    assert s["train_bf16_B64_ms"] == detail["train_step"]["bf16_B64_ms"]
    assert s["denoise_rtf"] == detail["denoise_rtf_single_stream"]
    # sidecar holds the full detail
    side = json.load(open(tmp_path / "bench_detail.json"))
    assert side["tse_roofline"] == detail["tse_roofline"]


def test_emit_result_survives_failed_sections(tmp_path, capsys):
    """Failed sections store error strings where dicts would be; smoke
    runs omit sections — the summary must skip them, not crash."""
    import json

    detail = {"platform": "cpu", "train_step": "failed: RuntimeError",
              "ns_streams_per_chip": "failed: XlaRuntimeError",
              "backend_fallback": "x" * 500}
    out = {"metric": "m", "value": 16.0, "unit": "streams",
           "vs_baseline": 0.032, "smoke": True}
    line = bench.emit_result(out, detail, repo_dir=str(tmp_path))
    parsed = json.loads(line)
    assert len(line) <= bench.LINE_BUDGET
    assert parsed["summary"]["platform"] == "cpu"
    assert "train_bf16_B64_ms" not in parsed["summary"]
    assert len(parsed["summary"]["backend_fallback"]) <= 120
