"""Native (C++) host-augmentation kernels vs their scipy references.

Round-4: speed perturb's polyphase resample and the biquad
frequency-response variation were the last Python hot spots in the loader
workers (VERDICT r3 item 6); csrc/augment.cpp replaces them bit-exactly.
"""
import numpy as np
import pytest
from scipy.signal import lfilter, resample_poly

from puresound_tpu.src import native
from puresound_tpu.src.audio import AudioAugmentor

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_resample_poly_bit_exact_vs_scipy(rng):
    x = rng.standard_normal(12000).astype(np.float32)
    for up, down in ((11111, 10000), (9091, 10000), (3, 2), (160, 441)):
        ref = resample_poly(x, up, down).astype(np.float32)
        got = native.resample_poly(x, up, down)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)
    # multi-channel (last-axis semantics) + up == down identity
    x2 = rng.standard_normal((2, 5000)).astype(np.float32)
    np.testing.assert_array_equal(
        native.resample_poly(x2, 12000, 8000),
        resample_poly(x2, 12000, 8000, axis=-1).astype(np.float32))
    np.testing.assert_array_equal(native.resample_poly(x2, 5, 5), x2)


def test_native_biquad_bit_exact_vs_lfilter(rng):
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    for _ in range(5):
        r = rng.uniform(-3 / 8, 3 / 8, 4)
        a = np.array([1, r[0], r[1]], np.float32)
        b = np.array([1, r[2], r[3]], np.float32)
        ref = lfilter(b, a, x, axis=-1).astype(np.float32)
        np.testing.assert_array_equal(native.biquad(b, a, x), ref)


def test_augmentor_routes_through_native_and_matches(rng):
    """The public augmentor surface (sox_speed_perturbed /
    add_variaion_response) returns the same samples whether or not the
    native library is used (monkeypatch-free check: native is available
    under this marker, so compare against the scipy formulas directly)."""
    aug = AudioAugmentor(16000)
    wav = rng.standard_normal((1, 16000)).astype(np.float32)

    speed = 1.07
    out, sp = aug.sox_speed_perturbed(wav, speed)
    up = int(round((1.0 / speed) * 10000))
    ref = resample_poly(wav, up, 10000, axis=-1).astype(np.float32)
    assert sp == speed
    np.testing.assert_array_equal(out, ref)

    out2, a, b = aug.add_variaion_response(wav)
    ref2 = lfilter(b, a, wav, axis=-1).astype(np.float32)
    np.testing.assert_array_equal(out2, ref2)
