"""Parity tests for src/filter.py and the FFC/SpectralTransform blocks.

Round-1 verdict called these untested; reference oracles are
puresound/src/filter.py and puresound/nnet/lobe/cnn.py:109-291.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.lobe.cnn import FFC, SpectralTransform
from puresound_tpu.src.filter import Filter, wav_drop_chunk, wav_drop_frequency


# ---------------------------------------------------------------------------
# Filter parity
# ---------------------------------------------------------------------------

def test_lowpass_filter_matches_reference(torch_oracle):
    from puresound.src.filter import Filter as RefFilter

    for cutoff, width in [(0.1, None), (0.25, 40), (0.02, None)]:
        ref = RefFilter.lowpass_filter(cutoff, width)
        mine = Filter.lowpass_filter(cutoff, width)
        np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_notch_filter_matches_reference(torch_oracle):
    from puresound.src.filter import Filter as RefFilter

    for cutoff, nw, width in [(0.1, 0.05, None), (0.2, 0.01, 128), (0.05, 0.02, 512)]:
        ref = RefFilter.get_notch_filter(cutoff, nw, width)
        mine = Filter.get_notch_filter(cutoff, nw, width)
        np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_bandpass_filter_fixes_reference_bug(torch_oracle):
    """Reference get_bandpass_filter calls the nonexistent
    `Filter.get_lowpass_filter` (filter.py:44-46) and raises AttributeError;
    our fixed version equals lowpass(high) - lowpass(low)."""
    from puresound.src.filter import Filter as RefFilter

    with pytest.raises(AttributeError):
        RefFilter.get_bandpass_filter(0.1, 0.3, 64)

    mine = Filter.get_bandpass_filter(0.1, 0.3, 64)
    expect = RefFilter.lowpass_filter(0.3, 64) - RefFilter.lowpass_filter(0.1, 64)
    np.testing.assert_allclose(mine, expect, atol=1e-12)


def test_notch_filter_attenuates_band():
    """The notch must pass far-away bands and reject the notched one."""
    sr = 16000
    t = np.arange(sr) / sr
    keep = np.sin(2 * np.pi * 400 * t)
    # get_notch_filter centers the reject band at (cutoff + notch_width) * sr
    drop = np.sin(2 * np.pi * (0.125 + 0.01) * sr * t)
    h = Filter.get_notch_filter(0.125, 0.01, 512)
    keep_out = np.convolve(keep, h, mode="same")
    drop_out = np.convolve(drop, h, mode="same")
    keep_db = 10 * np.log10(np.mean(keep_out**2) / np.mean(keep**2))
    drop_db = 10 * np.log10(np.mean(drop_out**2) / np.mean(drop**2))
    assert keep_db > -1.0
    assert drop_db < -20.0


def test_wav_drop_frequency_matches_reference_math(torch_oracle, rng):
    """Reference wav_drop_frequency crashes on `np.ndarray.unsqueeze`
    (filter.py:121); ours matches its math up to that final reshape."""
    from puresound.src.filter import Filter as RefFilter

    sig = rng.standard_normal(4000).astype(np.float64)
    sr, cutoff_hz, width_hz = 16000, 2000.0, 300.0
    ref_h = RefFilter.get_notch_filter(cutoff_hz / sr, width_hz / sr, 512)
    expect = np.convolve(sig, ref_h, mode="same")
    out = wav_drop_frequency(sig, sr, cutoff_hz, width_hz, 512)
    assert out.shape == (1, 4000)
    np.testing.assert_allclose(out[0], expect, atol=1e-12)

    # drop band clamped at Nyquist
    out2 = wav_drop_frequency(sig, sr, 7900.0, 500.0, 512)
    assert np.isfinite(out2).all()


def test_wav_drop_chunk(rng):
    sig = rng.standard_normal(1000).astype(np.float32)
    out = wav_drop_chunk(sig, 0.5, 0.1)
    assert out.shape == (1, 1000)
    np.testing.assert_array_equal(out[0, 500:600], 0.0)
    np.testing.assert_array_equal(out[0, :500], sig[:500])
    np.testing.assert_array_equal(out[0, 600:], sig[600:])
    # width clipped at the end of the signal
    out2 = wav_drop_chunk(sig, 0.95, 0.2)
    np.testing.assert_array_equal(out2[0, 950:], 0.0)


# ---------------------------------------------------------------------------
# SpectralTransform / FFC parity (reference cnn.py:109-291)
# ---------------------------------------------------------------------------

def _copy_conv2d(tconv):
    return (jnp.asarray(tconv.weight.detach().numpy()),
            jnp.asarray(tconv.bias.detach().numpy()))


def test_spectral_transform_matches_torch_reference(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.cnn import SpectralTransform as RefST

    N, CH, C, T = 2, 4, 16, 12  # C even: ref irfft default length only works then
    x = rng.standard_normal((N, CH, C, T)).astype(np.float32)

    tmod = RefST(CH, 6, kernel_size=(3, 3), stride=(1, 1), causal=True)
    tmod.eval()
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x)).numpy()

    jmod = SpectralTransform(CH, 6, kernel_size=(3, 3), stride=(1, 1), causal=True)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    for name, tconv in [("in_conv", tmod.in_conv_bn_relu[1]),
                        ("fft_conv", tmod.fft_conv_bn_relu[0]),
                        ("out_conv", tmod.out_conv)]:
        w, b = _copy_conv2d(tconv)
        params[name] = {"w": w, "b": b}
    v = {**variables, "params": params}
    j_out = np.asarray(jmod.apply(v, jnp.asarray(x), False))
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_ffc_matches_torch_reference(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.cnn import FFC as RefFFC

    N, CIN, COUT, C, T = 1, 10, 10, 16, 10
    x = rng.standard_normal((N, CIN, C, T)).astype(np.float32)

    tmod = RefFFC(CIN, COUT, alpha=0.3, kernel_size=(3, 3), stride=(1, 1), causal=True)
    tmod.eval()
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x)).numpy()

    jmod = FFC(CIN, COUT, alpha=0.3, kernel_size=(3, 3), stride=(1, 1), causal=True)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    st = dict(params["global_spec_trans"])
    for name, tconv in [("in_conv", tmod.global_spec_trans.in_conv_bn_relu[1]),
                        ("fft_conv", tmod.global_spec_trans.fft_conv_bn_relu[0]),
                        ("out_conv", tmod.global_spec_trans.out_conv)]:
        w, b = _copy_conv2d(tconv)
        st[name] = {"w": w, "b": b}
    params = dict(params)
    params["global_spec_trans"] = st
    for name, tconv in [("global_conv", tmod.global_conv[1]),
                        ("local_global_conv", tmod.local_global_conv[1]),
                        ("local_local_conv", tmod.local_local_conv[1])]:
        w, b = _copy_conv2d(tconv)
        params[name] = {"w": w, "b": b}
    v = {**variables, "params": params}
    j_out = np.asarray(jmod.apply(v, jnp.asarray(x), False))
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_ffc_causal_time_padding(rng):
    """Causal FFC: output at frame t must not depend on frames > t."""
    N, CIN, C, T = 1, 10, 16, 12
    x = rng.standard_normal((N, CIN, C, T)).astype(np.float32)
    jmod = FFC(CIN, CIN, alpha=0.3, kernel_size=(3, 3), causal=True)
    v = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    base = np.asarray(jmod.apply(v, jnp.asarray(x), False))
    x2 = x.copy()
    x2[..., 6:] = rng.standard_normal((N, CIN, C, T - 6)).astype(np.float32)
    pert = np.asarray(jmod.apply(v, jnp.asarray(x2), False))
    np.testing.assert_allclose(pert[..., :6], base[..., :6], atol=1e-5)
    assert np.abs(pert[..., 6:] - base[..., 6:]).max() > 1e-4
