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
