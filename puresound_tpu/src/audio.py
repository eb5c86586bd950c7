"""Audio I/O + on-the-fly augmentation (host-side numpy/scipy pipeline).

Parity: puresound/src/audio.py (AudioIO :10, AudioAugmentor :191). The
torchaudio/sox dependencies are replaced by native equivalents:
- wav via scipy.io.wavfile, flac via the bundled pure-Python decoder
- sox `speed` == resampling (tempo+pitch) via polyphase resampling
- biquad frequency-response variation via scipy.signal.lfilter
Augmentation runs in the host data pipeline; the device only ever sees
fixed-shape batches.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter, resample_poly

from .flac import read_flac
from .utils import fftconvolve, recursive_read_folder


class AudioIO:
    def __init__(self, verbose: bool = False) -> None:
        self.verbose = verbose

    @staticmethod
    def audio_info(f_path: str) -> Tuple[int, float, int]:
        wav, sr = AudioIO._read(f_path)
        return sr, round(wav.shape[-1] / sr, 2), wav.shape[0]

    @staticmethod
    def _read(f_path: str) -> Tuple[np.ndarray, int]:
        """Returns float32 [channels, samples] in [-1, 1] + sample rate.

        Prefers the native C++ decoder (csrc/audio_decode.cpp, ~70x faster
        than the Python FLAC path); falls back to pure Python/scipy."""
        from . import native

        if native.available():
            try:
                if f_path.lower().endswith(".flac"):
                    return native.read_flac(f_path)
                return native.read_wav(f_path)
            except (ValueError, RuntimeError):
                pass  # unusual encodings fall through to the Python path
        if f_path.lower().endswith(".flac"):
            return read_flac(f_path)
        sr, wav = wavfile.read(f_path)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        elif wav.dtype == np.uint8:
            wav = (wav.astype(np.float32) - 128.0) / 128.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim == 1:
            wav = wav[None, :]
        else:
            wav = wav.T
        return wav, sr

    @staticmethod
    def open(f_path: str, normalized: bool = False,
             target_lvl: Optional[float] = None,
             verbose: bool = False) -> Tuple[np.ndarray, int]:
        wav, sr = AudioIO._read(f_path)
        if normalized:
            if target_lvl is not None and verbose:
                print("normalized chosen; target_lvl ignored")
            wav = AudioIO.normalize_waveform(wav, amp_type="avg")
        if target_lvl is not None:
            wav = AudioIO.rescale_waveform(wav, target_lvl=target_lvl,
                                           amp_type="avg", scale="dB")
        return wav, sr

    @staticmethod
    def save(wav: np.ndarray, f_path: str, sr: int) -> None:
        wav = np.asarray(wav)
        if wav.ndim == 2:
            wav = wav.T  # [samples, channels]
        wav16 = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
        wavfile.write(f_path, sr, wav16)

    @staticmethod
    def audio_cut(wav: np.ndarray, sr: int, length_s: float):
        if wav.ndim == 1:
            wav = wav[None, :]
        wav, offset, end = AudioIO.cut_audio(wav, sr, length_s, padding=True)
        return wav, (offset, end)

    @staticmethod
    def normalize_waveform(wav: np.ndarray, amp_type: str = "avg") -> np.ndarray:
        eps = 1e-14
        assert amp_type in ("avg", "peak")
        if amp_type == "avg":
            den = np.mean(np.abs(wav), axis=-1, keepdims=True)
        else:
            den = np.max(np.abs(wav), axis=-1, keepdims=True)
        return wav / (den + eps)

    @staticmethod
    def rescale_waveform(wav: np.ndarray, target_lvl: float,
                         amp_type: str = "avg", scale: str = "linear") -> np.ndarray:
        assert amp_type in ("peak", "avg") and scale in ("linear", "dB")
        wav = AudioIO.normalize_waveform(wav, amp_type)
        if scale == "dB":
            target_lvl = 10 ** (target_lvl / 20)
        return target_lvl * wav

    @staticmethod
    def cut_audio(wav: np.ndarray, sr: int, length_s: float,
                  padding: bool = False):
        audio_len = wav.shape[-1]
        target = int(sr * length_s)
        if audio_len > target:
            offset = random.randint(0, audio_len - target)
            return wav[..., offset : offset + target], offset, offset + target
        if padding:
            pad = np.zeros((*wav.shape[:-1], target - audio_len), wav.dtype)
            return np.concatenate([wav, pad], axis=-1), 0, target
        return wav, 0, audio_len

    @staticmethod
    def resample(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
        if orig_sr == new_sr:
            return wav
        from math import gcd

        g = gcd(orig_sr, new_sr)
        return _resample_poly_f32(wav, new_sr // g, orig_sr // g)


def _resample_poly_f32(wav: np.ndarray, up: int, down: int) -> np.ndarray:
    """Polyphase resample, preferring the native C++ kernel (bit-exact vs
    scipy.signal.resample_poly on f32 input, ~20x faster warm: taps cached
    per (up, down) instead of rebuilt per call — tests/test_metrics.py
    gates the equivalence)."""
    from . import native

    if native.available():
        return native.resample_poly(np.asarray(wav, np.float32), up, down)
    return resample_poly(wav, up, down, axis=-1).astype(np.float32)


class AudioAugmentor:
    """On-the-fly waveform augmentation: speed/volume perturb, additive
    noise at target SNR, RIR reverberation (image/direct/early), biquad
    frequency-response variation, white noise."""

    def __init__(self, sample_rate: int, convolve_mode: str = "fft"):
        self.sr = sample_rate
        assert convolve_mode in ("convolution", "fft")
        self.conv_mode = convolve_mode
        self.bg_noise: Dict = {}
        self.fg_noise: Dict = {}
        self.rir: Dict = {}

    # ------------------------------------------------------------ sox-style
    def sox_effect(self, wav: np.ndarray, sr: int = 16000) -> np.ndarray:
        speed = float(np.random.uniform(0.8, 1.2))
        vol = float(np.random.uniform(0.125, 2))
        wav, _ = self.sox_speed_perturbed(wav, speed, sr)
        return self.sox_volumn_perturbed(wav, vol, sr)

    def sox_volumn_perturbed(self, wav: np.ndarray, vol_ratio: float,
                             sr: int = 16000) -> np.ndarray:
        return wav * vol_ratio

    def sox_speed_perturbed(self, wav: np.ndarray, speed: float,
                            sr: int = 16000) -> Tuple[np.ndarray, float]:
        """sox `speed` changes tempo AND pitch == playback-rate change ==
        resampling by 1/speed then playing at sr."""
        if speed == 1.0:
            return wav, speed
        # resample sr -> sr/speed (then interpret at sr)
        ratio = 1.0 / speed
        up = int(round(ratio * 10000))
        out = _resample_poly_f32(wav, up, 10000)
        return out, speed

    # ----------------------------------------------------------- bg / noise
    def add_bg_noise(self, wav: np.ndarray, snr_list: List[float]) -> List[np.ndarray]:
        """Mix one random corpus noise at each SNR (power-scaled)."""
        wav_power = np.linalg.norm(wav)
        noise_id = random.choice(list(self.bg_noise.keys()))
        noise, sr = AudioIO.open(self.bg_noise[noise_id]["wav_path"])
        if noise.shape[0] != 1:
            noise = noise[0:1]
        if sr != self.sr:
            noise = AudioIO.resample(noise, sr, self.sr)
        L, Ln = wav.shape[-1], noise.shape[-1]
        if L <= Ln:
            s = int(np.random.randint(0, Ln - L)) if Ln > L else 0
            noise = noise[:, s : s + L]
        else:
            noise = np.tile(noise, (1, round(L / Ln) + 1))[:, :L]
        noise_power = np.linalg.norm(noise)
        out = []
        for snr_db in snr_list:
            snr = 10 ** (snr_db / 10)
            scale = np.sqrt(wav_power / (snr * noise_power + 1e-8))
            out.append(wav + scale * noise)
        return out

    def _get_white_noise_with_snr(self, wav: np.ndarray, snr: float) -> np.ndarray:
        rms_s = np.sqrt(np.mean(wav**2, axis=-1))
        rms_n = np.sqrt(rms_s**2 / (10 ** (snr / 10)))
        return np.random.normal(0, float(rms_n), wav.shape[-1]).astype(
            np.float32).reshape(1, -1)

    # ------------------------------------------------------------------ RIR
    def _apply_impulse(self, wav: np.ndarray, impulse: np.ndarray) -> np.ndarray:
        impulse = impulse / np.linalg.norm(impulse)
        if self.conv_mode == "fft":
            out = fftconvolve(wav, impulse, mode="full")
            delay = int(np.argmax(np.abs(impulse), axis=-1).reshape(-1)[0])
            out = out[..., delay : delay + wav.shape[-1]]
        else:
            from .utils import convolve

            out = convolve(wav, impulse[..., ::-1])
        assert out.shape[-1] == wav.shape[-1]
        return out.astype(np.float32)

    def apply_rir(self, wav: np.ndarray):
        key = random.choice(list(self.rir.keys()))
        impulse, sr = AudioIO.open(self.rir[key]["wav_path"])
        choose_ch = None
        if impulse.shape[0] != 1:
            choose_ch = random.randint(0, impulse.shape[0] - 1)
            impulse = impulse[choose_ch : choose_ch + 1]
        if sr != self.sr:
            impulse = AudioIO.resample(impulse, sr, self.sr)
        return self._apply_impulse(wav, impulse), key, choose_ch

    def apply_rir_by_key(self, wav: np.ndarray, key: str,
                         choose_ch: Optional[int] = None,
                         rir_mode: str = "image", sr: int = 16000) -> np.ndarray:
        impulse, sr = AudioIO.open(self.rir[key]["wav_path"])
        if impulse.shape[0] != 1:
            if choose_ch is None:
                choose_ch = random.randint(0, impulse.shape[0] - 1)
        else:
            choose_ch = 0
        impulse = impulse[choose_ch : choose_ch + 1]
        if sr != self.sr:
            impulse = AudioIO.resample(impulse, sr, self.sr)
        mode = rir_mode.lower()
        if mode == "image":
            pass
        elif mode == "direct":
            peak = int(np.argmax(impulse))
            impulse = impulse[:, : peak + int(sr * 0.006)]
        elif mode == "early":
            peak = int(np.argmax(impulse))
            impulse = impulse[:, : peak + int(sr * 0.05)]
        else:
            raise NameError(rir_mode)
        return self._apply_impulse(wav, impulse)

    # --------------------------------------------------------------- biquad
    def add_variaion_response(self, wav: np.ndarray,
                              a_coeffs: Optional[np.ndarray] = None,
                              b_coeffs: Optional[np.ndarray] = None):
        """Random biquad frequency-response variation (ref [1] in
        audio.py:448)."""
        if a_coeffs is None and b_coeffs is None:
            r = np.random.uniform(-3 / 8, 3 / 8, 4)
            a_coeffs = np.array([1, r[0], r[1]], np.float32)
            b_coeffs = np.array([1, r[2], r[3]], np.float32)
        from . import native

        if native.available() and len(a_coeffs) == 3 and len(b_coeffs) == 3:
            # native biquad (bit-exact vs lfilter f32, no scipy dispatch)
            out = native.biquad(b_coeffs, a_coeffs,
                                np.asarray(wav, np.float32))
        else:
            out = lfilter(b_coeffs, a_coeffs, wav, axis=-1).astype(np.float32)
        return out, a_coeffs, b_coeffs

    # -------------------------------------------------------------- corpora
    def load_bg_noise_from_folder(self, folder: str) -> None:
        self.bg_noise = self._load_wav_folder(folder)

    def load_fg_noise_from_folder(self, folder: str) -> None:
        self.fg_noise = self._load_wav_folder(folder)

    def load_rir_from_folder(self, folder: str) -> None:
        self.rir = self._load_wav_folder(folder)

    def _load_wav_folder(self, folder: str) -> Dict:
        temp = {}
        wav_list: List[str] = []
        recursive_read_folder(folder, ".wav", wav_list)
        for file in wav_list:
            path = file.strip().split(" ")[1]
            uttid = "_".join(path.split("/")[-1].split(".")[0:-1])
            temp[uttid] = {"wav_path": path}
        return temp
