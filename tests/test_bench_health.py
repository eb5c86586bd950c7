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
