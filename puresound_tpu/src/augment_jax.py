"""On-device (jitted) batched audio augmentation.

The host augmentation chain (src/audio.py AudioAugmentor, mirroring
puresound/src/audio.py:700-900) runs per item in DataLoader workers; on
this class of host the sustained-training bench measured the TRAIN STEP
64% idle waiting on it (docs/BENCHMARKS.md "Sustained end-to-end
training"). The two expensive stages — RIR convolution and noise
mixing — are embarrassingly batchable convolutions/gathers, i.e. exactly
what the TPU is idle-waiting to do.

`DeviceAugmentor` preloads the noise/RIR corpora ONCE into padded device
banks and applies, per example inside the jitted train step (so it also
shards over the data-parallel mesh for free):

- RIR: full FFT convolution against a bank row, delay-aligned to the
  impulse peak exactly like AudioAugmentor._apply_impulse; the training
  target is warped with the image/direct/early variant per `rir_mode`
  (anechoic leaves the target dry), truncated-then-normalized like
  AudioAugmentor.apply_rir_by_key.
- bg noise at a per-example uniform SNR, reproducing the reference's
  exact power scale sqrt(||wav|| / (snr * ||noise|| + 1e-8)) — L2 norms,
  not powers (reference quirk, audio.py:173-194 here). Noise slices wrap
  around the corpus row (the host path tiles short noises and random-
  crops long ones; wraparound from a random phase is the batched
  equivalent).
- volume perturb (shared ratio for input and target) + [-1, 1] clip.
- per-example NaN rollback (the host chain's safety net).

Speed perturbation changes the sample count (not jittable with static
shapes) and the biquad response is a 2nd-order IIR (a serial scan —
wrong shape for the TPU): both stay host-side; they are the cheap part
of the chain. Ordering note: host-side the biquad runs AFTER noise
mixing (it shapes the noise too); in on-device mode it runs before —
it commutes exactly with the (LTI) RIR convolution but not with noise
mixing, so the response perturbation no longer shapes the added noise.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .audio import AudioIO
from .utils import recursive_read_folder


def _load_folder_rows(folder: str, sr: int, max_len: int):
    """Load every wav under `folder` into a padded [N, max_len] matrix
    (longer files truncated), plus the true lengths [N]."""
    wav_list = []
    recursive_read_folder(folder, ".wav", wav_list)
    rows, lens = [], []
    for file in sorted(wav_list):
        path = file.strip().split(" ")[1]
        wav, fsr = AudioIO.open(f_path=path)
        if wav.shape[0] != 1:
            wav = wav[0:1]
        if fsr != sr:
            wav = AudioIO.resample(wav, fsr, sr)
        w = wav[0, :max_len].astype(np.float32)
        lens.append(w.shape[0])
        rows.append(np.pad(w, (0, max_len - w.shape[0])))
    if not rows:
        raise ValueError(f"no .wav files under {folder}")
    return np.stack(rows), np.asarray(lens, np.int32)


def _rir_variant(row: np.ndarray, length: int, sr: int, mode: str):
    """Truncate-then-normalize an impulse like apply_rir_by_key; returns
    (normalized impulse padded to the input size, peak delay, length)."""
    imp = row[:length]
    if mode == "direct":
        peak = int(np.argmax(imp))
        imp = imp[: peak + int(sr * 0.006)]
    elif mode == "early":
        peak = int(np.argmax(imp))
        imp = imp[: peak + int(sr * 0.05)]
    elif mode != "image":
        raise NameError(mode)
    n = np.linalg.norm(imp)
    imp = imp / (n if n > 0 else 1.0)
    delay = int(np.argmax(np.abs(imp)))
    out = np.zeros_like(row)
    out[: imp.shape[0]] = imp
    return out, delay, imp.shape[0]


class DeviceAugmentor:
    """Batched jittable RIR + noise + volume augmentation from preloaded
    corpus banks. Use through `make_augment_fn` / `__call__` inside a
    jitted train step."""

    @classmethod
    def from_arrays(cls, sample_rate: int,
                    noise: Optional[np.ndarray] = None,
                    rir: Optional[np.ndarray] = None, **kw):
        """Synthetic banks (tests / multi-chip dryruns): noise [N, L] and
        rir [N, Lr] numpy arrays instead of corpus folders."""
        import tempfile

        from scipy.io import wavfile

        with tempfile.TemporaryDirectory() as td:
            nf = rf = None
            if noise is not None:
                nf = os.path.join(td, "noise")
                os.makedirs(nf)
                for i, row in enumerate(noise):
                    wavfile.write(os.path.join(nf, f"n{i}.wav"), sample_rate,
                                  (np.clip(row, -1, 1) * 32767).astype(np.int16))
            if rir is not None:
                rf = os.path.join(td, "rir")
                os.makedirs(rf)
                for i, row in enumerate(rir):
                    wavfile.write(os.path.join(rf, f"r{i}.wav"), sample_rate,
                                  (np.clip(row, -1, 1) * 32767).astype(np.int16))
            return cls(sample_rate, noise_folder=nf, rir_folder=rf, **kw)

    def __init__(self, sample_rate: int,
                 noise_folder: Optional[str] = None,
                 rir_folder: Optional[str] = None,
                 rir_mode: str = "image",
                 noise_snr_range: Tuple[float, float] = (-5.0, 15.0),
                 vol_range: Optional[Tuple[float, float]] = None,
                 p_noise: float = 0.8,
                 p_rir: float = 0.8,
                 max_noise_seconds: float = 10.0,
                 max_rir_seconds: float = 0.5):
        import jax.numpy as jnp

        self.sr = sample_rate
        self.rir_mode = rir_mode.lower()
        self.noise_snr_range = tuple(noise_snr_range)
        self.vol_range = tuple(vol_range) if vol_range else None
        self.p_noise = float(p_noise)
        self.p_rir = float(p_rir)

        self.noise_bank = None
        if noise_folder:
            rows, lens = _load_folder_rows(
                noise_folder, sample_rate, int(sample_rate * max_noise_seconds))
            self.noise_bank = jnp.asarray(rows)
            self.noise_len = jnp.asarray(lens)

        self.rir_bank = None
        if rir_folder:
            rows, lens = _load_folder_rows(
                rir_folder, sample_rate, int(sample_rate * max_rir_seconds))
            in_rows, in_delays = [], []
            tg_rows, tg_delays = [], []
            for row, ln in zip(rows, lens):
                imp, d, _ = _rir_variant(row, int(ln), sample_rate, "image")
                in_rows.append(imp)
                in_delays.append(d)
                if self.rir_mode != "anechoic":
                    imp, d, _ = _rir_variant(row, int(ln), sample_rate,
                                             self.rir_mode)
                    tg_rows.append(imp)
                    tg_delays.append(d)
            self.rir_bank = jnp.asarray(np.stack(in_rows))
            self.rir_delay = jnp.asarray(np.asarray(in_delays, np.int32))
            if self.rir_mode != "anechoic":
                self.rir_bank_target = jnp.asarray(np.stack(tg_rows))
                self.rir_delay_target = jnp.asarray(
                    np.asarray(tg_delays, np.int32))

    # ------------------------------------------------------------- batched ops
    def _convolve_delayed(self, wav, imp, delay):
        """FFT 'full' convolution, sliced [delay : delay + L] per example
        (== AudioAugmentor._apply_impulse). wav [B, L], imp [B, Lr].

        The FFT length is rounded up to a power of two: XLA's TPU FFT
        falls back to a materialized DFT-matrix program for sizes with
        large prime factors (measured ~530 ms at n=39999 vs ~0 at 65536
        on v5e — it built u32[n, n] twiddle matrices), so the exact
        L + Lr - 1 length is catastrophically slower than the padded one.
        """
        import jax.numpy as jnp

        L = wav.shape[-1]
        n = L + imp.shape[-1] - 1
        n = 1 << (n - 1).bit_length()
        out = jnp.fft.irfft(jnp.fft.rfft(wav, n) * jnp.fft.rfft(imp, n), n)
        idx = delay[:, None] + jnp.arange(L)[None, :]
        return jnp.take_along_axis(out, idx, axis=-1).astype(wav.dtype)

    def _mix_noise(self, rng, wav):
        """Reference power scale: sqrt(||wav|| / (snr * ||noise|| + 1e-8))."""
        import jax
        import jax.numpy as jnp

        B, L = wav.shape
        k_idx, k_start, k_snr = jax.random.split(rng, 3)
        n_rows = self.noise_bank.shape[0]
        idx = jax.random.randint(k_idx, (B,), 0, n_rows)
        nlen = self.noise_len[idx]
        start = (jax.random.uniform(k_start, (B,))
                 * nlen.astype(jnp.float32)).astype(jnp.int32)
        pos = (start[:, None] + jnp.arange(L)[None, :]) % nlen[:, None]
        noise = jnp.take_along_axis(self.noise_bank[idx], pos, axis=-1)
        snr_db = jax.random.uniform(
            k_snr, (B,), minval=self.noise_snr_range[0],
            maxval=self.noise_snr_range[1])
        snr = 10.0 ** (snr_db / 10.0)
        wav_power = jnp.linalg.norm(wav, axis=-1)
        noise_power = jnp.linalg.norm(noise, axis=-1)
        scale = jnp.sqrt(wav_power / (snr * noise_power + 1e-8))
        return wav + scale[:, None] * noise.astype(wav.dtype)

    # ------------------------------------------------------------------ apply
    def __call__(self, rng, noisy, clean, vol_extra=None, inactive=None):
        """[B, L] (or [B, 1, L]) input/target -> augmented pair; all
        randomness from `rng` (per-example draws).

        vol_extra: optional list of extra signals (e.g. the TSE enrollment)
        scaled by the SAME volume ratio (the host chain's _vol_perturb
        couples them). inactive: optional [B] bool — for those examples
        the target becomes the AUGMENTED mixture (TSE inactive-speaker
        training: tasks/tse.py get_feature sets clean := process after
        augmentation)."""
        import jax
        import jax.numpy as jnp

        squeeze = noisy.ndim == 3
        if squeeze:
            noisy, clean = noisy[:, 0], clean[:, 0]
        B = noisy.shape[0]
        x, t = noisy, clean
        k_rir, k_rp, k_noise, k_np, k_vol = jax.random.split(rng, 5)

        if self.rir_bank is not None:
            idx = jax.random.randint(k_rir, (B,), 0, self.rir_bank.shape[0])
            use = jax.random.uniform(k_rp, (B,)) < self.p_rir
            wet = self._convolve_delayed(x, self.rir_bank[idx],
                                         self.rir_delay[idx])
            x = jnp.where(use[:, None], wet, x)
            if self.rir_mode != "anechoic":
                wet_t = self._convolve_delayed(
                    t, self.rir_bank_target[idx], self.rir_delay_target[idx])
                t = jnp.where(use[:, None], wet_t, t)

        if self.noise_bank is not None:
            use = jax.random.uniform(k_np, (B,)) < self.p_noise
            mixed = self._mix_noise(k_noise, x)
            x = jnp.where(use[:, None], mixed, x)

        extra = list(vol_extra) if vol_extra else []
        if self.vol_range is not None:
            lo, hi = self.vol_range
            ratio = jax.random.uniform(k_vol, (B,), minval=lo, maxval=hi)
            x = jnp.clip(x * ratio[:, None], -1.0, 1.0)
            t = jnp.clip(t * ratio[:, None], -1.0, 1.0)
            extra = [jnp.clip(e * ratio.reshape((B,) + (1,) * (e.ndim - 1)),
                              -1.0, 1.0) for e in extra]

        # per-example NaN rollback (host chain's safety net)
        bad = (jnp.any(jnp.isnan(x), axis=-1)
               | jnp.any(jnp.isnan(t), axis=-1))
        x = jnp.where(bad[:, None], noisy, x)
        t = jnp.where(bad[:, None], clean, t)
        if inactive is not None:
            t = jnp.where(inactive[:, None], x, t)
        if squeeze:
            x, t = x[:, None], t[:, None]
        return (x, t, extra) if vol_extra else (x, t)

    def make_augment_fn(self, noisy_key: str = "noisy",
                        target_key: str = "ref_clean",
                        inactive_key: Optional[str] = None,
                        vol_keys: Tuple[str, ...] = ()):
        """(rng, batch_kwargs) -> batch_kwargs for make_train_step's
        augment_fn hook. inactive_key names a [B] bool batch entry (TSE
        inactive-speaker targets); vol_keys name extra signals coupled to
        the volume ratio (TSE enrollment)."""
        def fn(rng, batch):
            out = dict(batch)
            inactive = batch[inactive_key] if inactive_key else None
            extra = [batch[k] for k in vol_keys if batch.get(k) is not None]
            if extra:
                x, t, extra = self(rng, batch[noisy_key], batch[target_key],
                                   vol_extra=extra, inactive=inactive)
                for k, e in zip([k for k in vol_keys
                                 if batch.get(k) is not None], extra):
                    out[k] = e
            else:
                x, t = self(rng, batch[noisy_key], batch[target_key],
                            inactive=inactive)
            out[noisy_key] = x
            out[target_key] = t
            return out
        return fn
