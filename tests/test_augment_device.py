"""On-device augmentation (src/augment_jax.DeviceAugmentor): equivalence
vs the host AudioAugmentor chain and the make_train_step hook."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)
SR = 16000


def _write_wav(path, data, sr=SR):
    from scipy.io import wavfile

    wavfile.write(path, sr, (np.clip(data, -1, 1) * 32767).astype(np.int16))


@pytest.fixture()
def corpora(tmp_path, rng):
    noise_dir = tmp_path / "noise"
    rir_dir = tmp_path / "rir"
    noise_dir.mkdir()
    rir_dir.mkdir()
    L = SR  # one second
    noise = rng.standard_normal(L).astype(np.float32) * 0.1
    _write_wav(noise_dir / "n0.wav", noise)
    # exponentially-decaying random impulse with a clear peak
    t = np.arange(int(SR * 0.2))
    imp = rng.standard_normal(t.shape[0]).astype(np.float32)
    imp *= np.exp(-t / (SR * 0.03))
    imp[: SR // 100] = 0.0
    imp[SR // 100] = 1.0  # peak at 10 ms -> nonzero alignment delay
    _write_wav(rir_dir / "r0.wav", imp * 0.5)
    return str(noise_dir), str(rir_dir)


def test_rir_matches_host_augmentor(corpora, rng):
    """Device RIR conv (bank row, delay-aligned slice) == the host
    AudioAugmentor._apply_impulse on the same file (both input 'image'
    and the truncated 'early' target variant)."""
    from puresound_tpu.src.audio import AudioAugmentor
    from puresound_tpu.src.augment_jax import DeviceAugmentor

    noise_dir, rir_dir = corpora
    host = AudioAugmentor(sample_rate=SR, convolve_mode="fft")
    host.load_rir_from_folder(rir_dir)
    dev = DeviceAugmentor(SR, rir_folder=rir_dir, rir_mode="early")

    wav = rng.standard_normal((1, SR)).astype(np.float32) * 0.3
    key = list(host.rir.keys())[0]
    ref_in = host.apply_rir_by_key(wav, key, rir_mode="image")
    ref_tg = host.apply_rir_by_key(wav, key, rir_mode="early")

    idx = jnp.zeros((1,), jnp.int32)
    got_in = np.asarray(dev._convolve_delayed(
        jnp.asarray(wav), dev.rir_bank[idx], dev.rir_delay[idx]))
    got_tg = np.asarray(dev._convolve_delayed(
        jnp.asarray(wav), dev.rir_bank_target[idx],
        dev.rir_delay_target[idx]))
    np.testing.assert_allclose(got_in, ref_in, atol=2e-5)
    np.testing.assert_allclose(got_tg, ref_tg, atol=2e-5)


def test_noise_mix_matches_host_scale(corpora, rng):
    """Degenerate SNR range + constant-slice-free setup (noise length ==
    signal length -> host slice is deterministic) reproduces the host
    power scale exactly."""
    from puresound_tpu.src.audio import AudioAugmentor
    from puresound_tpu.src.augment_jax import DeviceAugmentor

    noise_dir, _ = corpora
    host = AudioAugmentor(sample_rate=SR, convolve_mode="fft")
    host.load_bg_noise_from_folder(noise_dir)
    dev = DeviceAugmentor(SR, noise_folder=noise_dir,
                          noise_snr_range=(5.0, 5.0), p_noise=1.0)

    wav = rng.standard_normal((2, SR)).astype(np.float32) * 0.3
    ref = np.stack([host.add_bg_noise(wav[i:i + 1], [5.0])[0][0]
                    for i in range(2)])

    got = np.asarray(dev._mix_noise(KEY, jnp.asarray(wav)))
    # the device draws a random wraparound phase; undo it by comparing
    # the added-noise component against a rolled host component
    add_dev = got - wav
    add_ref = ref - wav
    for i in range(2):
        # scale is phase-invariant: ||added|| must match exactly
        np.testing.assert_allclose(np.linalg.norm(add_dev[i]),
                                   np.linalg.norm(add_ref[i]), rtol=1e-4)
        # and the added signal is a circular shift of the host's
        corr = np.fft.irfft(np.fft.rfft(add_dev[i])
                            * np.conj(np.fft.rfft(add_ref[i])))
        best = np.argmax(corr)
        np.testing.assert_allclose(np.roll(add_ref[i], best), add_dev[i],
                                   atol=5e-4)


def test_full_call_applies_and_rolls_back_nan(corpora, rng):
    from puresound_tpu.src.augment_jax import DeviceAugmentor

    noise_dir, rir_dir = corpora
    dev = DeviceAugmentor(SR, noise_folder=noise_dir, rir_folder=rir_dir,
                          rir_mode="anechoic", vol_range=(0.5, 0.5),
                          p_noise=1.0, p_rir=1.0)
    noisy = jnp.asarray(rng.standard_normal((2, 1, SR)).astype(np.float32) * 0.2)
    clean = jnp.asarray(rng.standard_normal((2, 1, SR)).astype(np.float32) * 0.2)
    x, t = dev(KEY, noisy, clean)
    assert x.shape == noisy.shape and t.shape == clean.shape
    assert not np.allclose(np.asarray(x), np.asarray(noisy))  # augmented
    # anechoic: target only volume-scaled (ratio 0.5 exactly)
    np.testing.assert_allclose(np.asarray(t), np.asarray(clean) * 0.5,
                               atol=1e-6)

    # poison the noise bank -> every example NaNs -> rollback to input
    dev.noise_bank = jnp.full_like(dev.noise_bank, jnp.nan)
    x, t = dev(KEY, noisy, clean)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(noisy))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(clean))


def test_train_step_augment_fn_hook(corpora, rng):
    """make_train_step(augment_fn=...) runs the device augmentation inside
    the jitted step; loss decreases over a few steps and differs from the
    un-augmented run."""
    import optax

    from puresound_tpu.parallel import TrainState, make_train_step
    from puresound_tpu.src.augment_jax import DeviceAugmentor
    from tests.test_parallel import _tiny_tse

    noise_dir, rir_dir = corpora
    dev = DeviceAugmentor(SR, noise_folder=noise_dir, p_noise=1.0)
    model = _tiny_tse()
    B, L = 2, 800
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    tx = optax.adam(1e-3)

    def run(fn):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model, grad_clip=10.0, donate=False,
                               augment_fn=fn)
        losses = []
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        return losses

    plain = run(None)
    aug = run(dev.make_augment_fn())
    assert all(np.isfinite(aug))
    assert abs(aug[0] - plain[0]) > 1e-6  # augmentation actually applied


def test_inactive_targets_become_augmented_mixture(corpora, rng):
    """TSE inactive-speaker semantics: target := the augmented mixture
    for inactive rows (tasks/tse.py get_feature), clean target elsewhere;
    the volume ratio also scales the coupled extra signal (enrollment)."""
    from puresound_tpu.src.augment_jax import DeviceAugmentor

    noise_dir, _ = corpora
    dev = DeviceAugmentor(SR, noise_folder=noise_dir, p_noise=1.0,
                          noise_snr_range=(5.0, 15.0), vol_range=(0.5, 0.5))
    noisy = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.2)
    clean = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.2)
    enroll = jnp.asarray(rng.standard_normal((2, SR // 2)).astype(np.float32))
    inactive = jnp.asarray([True, False])

    fn = dev.make_augment_fn(inactive_key="inactive_labels",
                             vol_keys=("enroll",))
    out = fn(KEY, {"noisy": noisy, "ref_clean": clean, "enroll": enroll,
                   "inactive_labels": inactive})
    x, t, e = np.asarray(out["noisy"]), np.asarray(out["ref_clean"]), \
        np.asarray(out["enroll"])
    np.testing.assert_array_equal(t[0], x[0])           # inactive: t == x
    np.testing.assert_allclose(t[1], np.asarray(clean)[1] * 0.5, atol=1e-6)
    np.testing.assert_allclose(e, np.clip(np.asarray(enroll) * 0.5, -1, 1),
                               atol=1e-6)                # vol couples enroll
