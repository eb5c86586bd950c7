"""DSP core tests: kernels, overlap-add, STFT round-trips, torch parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.dsp.stft import (
    fourier_kernels,
    hann_window,
    mel_filterbank,
    overlap_add,
    window_sumsquare,
)
from puresound_tpu.nnet.encoder import ConvEncDec, ConvSTFT, FbankEnc, FreeEncDec


def test_overlap_add_matches_naive(rng):
    T, W, hop = 7, 32, 16
    frames = rng.standard_normal((2, T, W)).astype(np.float32)
    out = np.asarray(overlap_add(jnp.asarray(frames), hop))
    ref = np.zeros((2, W + hop * (T - 1)), np.float32)
    for t in range(T):
        ref[:, t * hop : t * hop + W] += frames[:, t]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_overlap_add_nondivisible_hop(rng):
    T, W, hop = 5, 30, 7
    frames = rng.standard_normal((1, T, W)).astype(np.float32)
    out = np.asarray(overlap_add(jnp.asarray(frames), hop))
    ref = np.zeros((1, W + hop * (T - 1)), np.float32)
    for t in range(T):
        ref[:, t * hop : t * hop + W] += frames[:, t]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_window_sumsquare():
    win = hann_window(512)
    ws = np.asarray(window_sumsquare(jnp.asarray(win), 10, 128, 512))
    ref = np.zeros(512 + 128 * 9, np.float32)
    for t in range(10):
        ref[t * 128 : t * 128 + 512] += win**2
    np.testing.assert_allclose(ws, ref, atol=1e-6)


def test_conv_stft_roundtrip(rng):
    """iSTFT(STFT(x)) == x away from window edges."""
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    model = ConvEncDec(fft_length=512, win_length=512, hop_length=128,
                       trainable=False, output_format="Complex")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    X = model.apply(params, jnp.asarray(x))
    y = np.asarray(model.apply(params, X, method=ConvEncDec.inverse))
    # output is shorter: L' = 512 + 128*(T-1); compare interior
    L = y.shape[-1]
    np.testing.assert_allclose(y[:, 512:L - 512], x[:, 512 : L - 512], atol=5e-3, rtol=1e-3)


def test_conv_stft_matches_torch_reference(torch_oracle, rng):
    """Numeric parity with the reference nnAudio-style ConvSTFT on random weights."""
    torch = torch_oracle
    from puresound.nnet.lobe.encoder import ConvEncDec as TorchConvEncDec

    x = rng.standard_normal((1, 8000)).astype(np.float32) * 0.2
    tmodel = TorchConvEncDec(fft_length=256, win_length=256, hop_length=64,
                             trainable=True, output_format="Complex")
    tmodel.eval()

    jmodel = ConvEncDec(fft_length=256, win_length=256, hop_length=64,
                        trainable=True, output_format="Complex")
    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # copy torch weights (trainable wsin/wcos) into jax params
    p = jax.tree_util.tree_map(lambda a: a, params)
    wsin = tmodel.encoder.wsin.detach().numpy().reshape(p["params"]["encoder"]["wsin"].shape)
    wcos = tmodel.encoder.wcos.detach().numpy().reshape(p["params"]["encoder"]["wcos"].shape)
    p = jax.tree_util.tree_map(lambda a: a, params)
    p["params"]["encoder"]["wsin"] = jnp.asarray(wsin)
    p["params"]["encoder"]["wcos"] = jnp.asarray(wcos)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()  # [N, F, T, 2]
    j_out = np.asarray(jmodel.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-4)

    # inverse parity
    with torch.no_grad():
        t_wav = tmodel.inverse(torch.from_numpy(t_out)).numpy()
    j_wav = np.asarray(jmodel.apply(p, jnp.asarray(j_out), method=ConvEncDec.inverse))
    np.testing.assert_allclose(j_wav, t_wav, atol=2e-4, rtol=1e-4)


def test_free_encdec_matches_torch_reference(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.encoder import FreeEncDec as TorchFreeEncDec

    x = rng.standard_normal((2, 4000)).astype(np.float32)
    tmodel = TorchFreeEncDec(win_length=32, hop_length=16, laten_length=128,
                             output_active=True)
    tmodel.eval()
    jmodel = FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                        output_active=True)
    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(params)
    p["params"] = {
        "enc_w": jnp.asarray(tmodel.encoder.weight.detach().numpy()),
        "dec_w": jnp.asarray(tmodel.decoder.weight.detach().numpy()),
    }
    with torch.no_grad():
        t_feats = tmodel(torch.from_numpy(x)).numpy()
        t_wav = tmodel.inverse(torch.from_numpy(t_feats)).numpy()
    j_feats = np.asarray(jmodel.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(j_feats, t_feats, atol=1e-5, rtol=1e-4)
    j_wav = np.asarray(jmodel.apply(p, jnp.asarray(j_feats), method=FreeEncDec.inverse))
    np.testing.assert_allclose(j_wav, t_wav, atol=1e-5, rtol=1e-4)


def test_mel_filterbank_matches_torch_reference(torch_oracle):
    from puresound.nnet.lobe.stft import mel_filterbank as torch_mel_fb

    ref = torch_mel_fb(sr=16000, n_fft=512, n_banks=80).numpy()
    mine = mel_filterbank(sr=16000, n_fft=512, n_banks=80)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_fbank_enc_shapes(rng):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    model = FbankEnc(trainable=False, output_format="Magnitude", n_banks=80)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mel = model.apply(params, jnp.asarray(x))
    assert mel.shape[0] == 2 and mel.shape[1] == 80


def test_fourier_kernels_match_torch_reference(torch_oracle):
    from puresound.nnet.lobe.stft import create_fourier_kernels

    ref_sin, ref_cos, _, _ = create_fourier_kernels(512, win_length=512, freq_scale="no", sr=16000)
    wsin, wcos, _, _ = fourier_kernels(512, win_length=512, freq_scale="no", sr=16000)
    np.testing.assert_allclose(wsin, ref_sin[:, 0, :], atol=1e-5)
    np.testing.assert_allclose(wcos, ref_cos[:, 0, :], atol=1e-5)


def test_native_audio_decoder_parity():
    """C++ decoder (csrc/audio_decode.cpp) must be bit-exact vs the Python
    FLAC decoder and scipy WAV on the bundled fixtures."""
    from scipy.io import wavfile

    from puresound_tpu.src import native
    from puresound_tpu.src.flac import read_flac as py_flac

    if not native.available():
        pytest.skip("native library not built and no toolchain")
    flac_path = "/root/reference/test/test_case/1272-141231-0008.flac"
    w_c, sr_c = native.read_flac(flac_path)
    w_p, sr_p = py_flac(flac_path)
    assert sr_c == sr_p
    np.testing.assert_array_equal(w_c, w_p)

    wav_path = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"
    w_cw, sr_cw = native.read_wav(wav_path)
    sr_s, w_s = wavfile.read(wav_path)
    w_s = (w_s.astype(np.float32) / 32768.0)
    w_s = w_s[None] if w_s.ndim == 1 else w_s.T
    assert sr_cw == sr_s
    np.testing.assert_allclose(w_cw, w_s, atol=0)


def test_fbank_magphase_inverse_roundtrip(rng):
    """FbankEnc MagPhase forward + pinv-mel inverse reconstructs speech-band
    content (lossy through the mel bottleneck, but bounded)."""
    x = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    model = FbankEnc(fft_length=512, hop_length=128, trainable=False,
                     output_format="MagPhase", n_banks=128, iSTFT=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mel, phase = model.apply(params, jnp.asarray(x))
    assert mel.shape[1] == 128
    y = np.asarray(model.apply(params, mel, phase, method=FbankEnc.inverse))
    assert np.isfinite(y).all()
    L = y.shape[-1]
    # mel bottleneck is lossy; demand correlation, not equality
    a = y[0, 512:L - 512]
    b = x[0, 512:L - 512]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.9


def test_conv_stft_short_window_matches_torch_reference(torch_oracle, rng):
    """win_length < n_fft: nnAudio semantics center-pad the window to n_fft.
    The reference ConvSTFT raises on a short window (encoder.py:339-340), so
    the oracle is the reference driven with the pre-padded window, which is
    the exact computation nnAudio performs."""
    torch = torch_oracle
    from puresound.nnet.lobe.encoder import ConvSTFT as TorchConvSTFT

    n_fft, win_length, hop = 256, 192, 64
    x = rng.standard_normal((1, 4000)).astype(np.float32) * 0.3
    twin = torch.hann_window(win_length)
    lpad = (n_fft - win_length) // 2
    twin_padded = torch.nn.functional.pad(twin, (lpad, n_fft - win_length - lpad))
    tmodel = TorchConvSTFT(twin_padded, n_fft=n_fft, win_length=win_length,
                           hop_length=hop, iSTFT=True, trainable=False,
                           output_format="Complex", sr=16000)
    tmodel.eval()

    jmodel = ConvSTFT(n_fft=n_fft, win_length=win_length, hop_length=hop,
                      iSTFT=True, trainable=False, output_format="Complex",
                      sr=16000)
    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)[:, None, :]).numpy()
    j_out = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-4)

    with torch.no_grad():
        t_wav = tmodel.inverse(torch.from_numpy(t_out)).numpy()
    j_wav = np.asarray(jmodel.apply(params, jnp.asarray(j_out), method=ConvSTFT.inverse))
    np.testing.assert_allclose(j_wav, t_wav, atol=2e-4, rtol=1e-4)


def test_conv_stft_magphase_inverse_roundtrip(rng):
    """MagPhase forward -> MagPhase inverse must equal the Complex-format
    reconstruction of the same signal (reference routes this through
    ConvMelSpectrogram.inverse, encoder.py:550-598; here it lives on
    ConvSTFT directly)."""
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.2
    mp = ConvSTFT(n_fft=512, hop_length=128, iSTFT=True, trainable=False,
                  output_format="MagPhase", sr=16000)
    cx = ConvSTFT(n_fft=512, hop_length=128, iSTFT=True, trainable=False,
                  output_format="Complex", sr=16000)
    p_mp = mp.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p_cx = cx.init(jax.random.PRNGKey(0), jnp.asarray(x))
    X_mp = mp.apply(p_mp, jnp.asarray(x))
    X_cx = cx.apply(p_cx, jnp.asarray(x))
    y_mp = np.asarray(mp.apply(p_mp, X_mp, method=ConvSTFT.inverse))
    y_cx = np.asarray(cx.apply(p_cx, X_cx, method=ConvSTFT.inverse))
    # skip the first/last window: the window sum-square is ~0 there and the
    # mag/phase repolarization amplifies float noise on near-silent samples
    L = y_mp.shape[-1]
    np.testing.assert_allclose(y_mp[:, 512:L - 512], y_cx[:, 512:L - 512],
                               atol=1e-4, rtol=1e-4)
    # and the round trip itself reconstructs the signal
    np.testing.assert_allclose(y_mp[:, 512:L - 512], x[:, 512:L - 512],
                               atol=5e-3, rtol=1e-3)


def test_fbank_enc_honors_sample_rate(torch_oracle):
    """FbankEnc must build its mel filterbank from the configured sr (the
    reference hardcodes 16000, encoder.py:493-494 — a bug for 8 kHz
    configs)."""
    from puresound.nnet.lobe.stft import mel_filterbank as torch_mel_fb

    model = FbankEnc(fft_length=512, hop_length=128, sr=8000,
                     trainable=False, output_format="Magnitude", n_banks=40)
    x = jnp.zeros((1, 4000), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    # bind to inspect the constant (non-param) filterbank
    bound = model.bind(params)
    fb = np.asarray(bound.stft and bound.filterbank)
    ref = torch_mel_fb(sr=8000, n_fft=512, n_banks=40).numpy().T
    np.testing.assert_allclose(fb, ref, atol=1e-6)
