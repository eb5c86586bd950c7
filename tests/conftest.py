"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths can
be exercised without TPU hardware (SURVEY.md §4 carry-over #5). This must be
set before jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT-cache noise

# Force CPU: the session env presets JAX_PLATFORMS=axon (a tunneled TPU),
# which would route every test op through the tunnel (slow) and use bf16
# matmul passes (breaks parity tolerances). Unit tests run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is overridden by the preinstalled TPU plugin; the config
# flag wins. Unit tests must run on host CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box is 1-core, recompiles dominate runtime.
# tests get their OWN persistent cache: sharing .jax_cache with
# concurrently-running TPU bench processes risks loading a concurrently
# half-written AOT artifact (observed as a hard abort mid-suite)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _make_torch_oracle_importable():
    """Allow importing the reference PyTorch package as a numeric oracle.

    The reference depends on torchaudio (absent in this image) only in a few
    leaf modules; register a minimal stub so pure-torch modules import.
    """
    import types

    if "torchaudio" in sys.modules:
        return
    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")

    def mask_along_axis(x, mask_param, mask_value, axis):  # pragma: no cover
        return x

    func.mask_along_axis = mask_along_axis
    ta.functional = func
    sox = types.ModuleType("torchaudio.sox_effects")
    ta.sox_effects = sox
    transforms = types.ModuleType("torchaudio.transforms")
    ta.transforms = transforms
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = func
    sys.modules["torchaudio.sox_effects"] = sox
    sys.modules["torchaudio.transforms"] = transforms
    sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="session")
def torch_oracle():
    """Import the reference implementation for numeric parity checks."""
    _make_torch_oracle_importable()
    import torch

    torch.manual_seed(0)
    return torch


# ---------------------------------------------------------------------------
# Long-suite stability (round 4): after ~250 tests the long-lived XLA-CPU
# process has been observed dying INSIDE a big compile's persistent-cache
# write (SIGSEGV in compilation_cache.put_executable_and_time; SIGABRT in
# the same region on other runs) — host memory is fine (128 GB free), it's
# process-age state corruption. Two mitigations:
#  1. run the heaviest full-model compiles FIRST, while the process is
#     young (they sat last alphabetically, exactly where the crash window
#     opens);
#  2. drop JAX's in-process executable/trace caches every N tests so
#     accumulated state stays bounded (the persistent disk cache makes
#     re-traces cheap).
# ---------------------------------------------------------------------------

_HEAVY_FIRST = ("test_waveform_parity", "test_grad_parity")

# Markers (round-4 durations run, 269 tests / 38 min total):
# - `slow`: the >60 s tests (subprocess CLI drives, overfit quality gates,
#   f64 grad-parity oracles) — `-m "not slow"` cuts the suite to ~22 min.
# - `quick`: a curated cheap-module allowlist (~4 min) covering the DSP/
#   loss/metric/augment/config contracts — the commit-gate subset:
#   `python -m pytest tests/ -m quick -q`.
_SLOW_TESTS = (
    "test_multihost.py::test_ns_cli_train_multihost",        # 229 s
    "test_tasks.py::test_ns_cli_train_multi_gpu",            # 175 s
    "test_grad_parity.py::test_ns_dpcrn_grad_parity",        # 69 s
    "test_grad_parity.py::test_ns_dparn_grad_parity",        # 64 s
)
_QUICK_MODULES = (
    "test_dsp.py", "test_loss.py", "test_lobe.py", "test_metrics.py",
    "test_pesq.py", "test_filter_ffc.py", "test_native_augment.py",
    "test_dataprep.py", "test_bench_health.py", "test_parallel.py",
    "test_server.py", "test_dataloader.py",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
        if any("/" + m + "::" in item.nodeid or item.nodeid.startswith(m)
               or ("tests/" + m) in item.nodeid for m in _QUICK_MODULES):
            item.add_marker(pytest.mark.quick)

    def bucket(item):
        for i, m in enumerate(_HEAVY_FIRST):
            if m in item.nodeid:
                return i
        return len(_HEAVY_FIRST)

    items.sort(key=bucket)  # stable: original order within buckets


_test_count = 0


def pytest_runtest_teardown(item, nextitem):
    global _test_count
    _test_count += 1
    if _test_count % 60 == 0:
        import gc

        jax.clear_caches()
        gc.collect()
