"""STFT / mel DSP substrate for the conv-STFT encoders.

Kernel construction is host-side numpy (it happens once, at module init);
the runtime ops (`overlap_add`, `window_sumsquare`) are jittable jnp and are
written as reshape/pad/add so XLA fuses them instead of emitting scatters.

Behavioral reference: puresound/nnet/lobe/stft.py (create_fourier_kernels,
overlap_add via fold, torch_window_sumsquare, mel_filterbank Slaney norm).
This is a fresh TPU-first implementation, not a translation: overlap-add is
a strided reshape-sum (no `fold`), and the Fourier kernels are flat [F, W]
matrices meant to be consumed by a single framed matmul on the MXU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Window / Fourier kernel construction (host-side, numpy)
# ---------------------------------------------------------------------------

def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (same convention as torch.hann_window)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def fourier_kernels(
    n_fft: int,
    win_length: Optional[int] = None,
    freq_bins: Optional[int] = None,
    fmin: float = 50.0,
    fmax: float = 6000.0,
    sr: int = 44100,
    freq_scale: str = "no",
) -> Tuple[np.ndarray, np.ndarray, list, list]:
    """Build sin/cos analysis kernels for a conv-STFT.

    Returns (wsin, wcos, bins2freq, bin_list) with wsin/wcos shaped
    [freq_bins, n_fft] (flat matrices — the conv layer reshapes as needed).

    freq_scale:
      - "no":     k-th bin at DFT frequency k (0 .. Nyquist), freq_bins bins
      - "linear": freq_bins bins linearly spaced between fmin..fmax
      - "log":    freq_bins bins log-spaced between fmin..fmax
    """
    if freq_bins is None:
        freq_bins = n_fft // 2 + 1
    if win_length is None:
        win_length = n_fft

    s = np.arange(0, n_fft, 1.0)
    bins2freq = []
    bin_list = []

    if freq_scale == "linear":
        start_bin = fmin * n_fft / sr
        scale_ind = (fmax - fmin) * (n_fft / sr) / freq_bins
        k_bins = np.arange(freq_bins) * scale_ind + start_bin
    elif freq_scale == "log":
        start_bin = fmin * n_fft / sr
        scale_ind = np.log(fmax / fmin) / freq_bins
        k_bins = np.exp(np.arange(freq_bins) * scale_ind) * start_bin
    elif freq_scale == "no":
        k_bins = np.arange(freq_bins).astype(np.float64)
    else:
        raise ValueError(f"unknown freq_scale: {freq_scale}")

    bins2freq = list(k_bins * sr / n_fft)
    bin_list = list(k_bins)

    phase = 2.0 * np.pi * k_bins[:, None] * s[None, :] / n_fft  # [F, n_fft]
    wsin = np.sin(phase).astype(np.float32)
    wcos = np.cos(phase).astype(np.float32)
    return wsin, wcos, bins2freq, bin_list


def inverse_fourier_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full inverse DFT bases cos/sin of shape [n_fft(freq), n_fft(time)].

    Synthesis of a frame from a full (Hermitian-extended) spectrum:
      frame[s] = (1/n_fft) * sum_f (re[f]*cos[f,s] - im[f]*sin[f,s])
    """
    k = np.arange(n_fft)
    phase = 2.0 * np.pi * k[:, None] * k[None, :] / n_fft
    return np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)


# ---------------------------------------------------------------------------
# Mel scale (Slaney / HTK-free convention, matching librosa defaults)
# ---------------------------------------------------------------------------

def hz_to_mel(frequencies) -> np.ndarray:
    freqs = np.asanyarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = freqs >= min_log_hz
        mels = np.where(log_t, min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep, mels)
    elif freqs >= min_log_hz:
        mels = min_log_mel + np.log(freqs / min_log_hz) / logstep
    return mels


def mel_to_hz(mels) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def fft_frequencies(sr: int = 16000, n_fft: int = 512) -> np.ndarray:
    return np.linspace(0, float(sr) / 2, int(1 + n_fft // 2), endpoint=True)


def mel_frequencies(n_mels: int = 128, fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    return mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels))


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_banks: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    norm: int = 1,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shape [n_banks, n_fft//2+1]."""
    if fmax is None:
        fmax = float(sr) / 2
    fftfreqs = fft_frequencies(sr=sr, n_fft=n_fft)
    mel_f = mel_frequencies(n_banks + 2, fmin=fmin, fmax=fmax)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper)).astype(np.float32)

    if norm == 1:
        enorm = 2.0 / (mel_f[2 : n_banks + 2] - mel_f[:n_banks])
        weights *= enorm[:, None].astype(np.float32)

    if not np.all((mel_f[:-2] == 0) | (weights.max(axis=1) > 0)):
        raise ValueError("Empty mel filter channels; raise sr/fmax or lower n_banks.")
    return weights


# ---------------------------------------------------------------------------
# Overlap-add / window sum-square (jittable)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add frames into a signal.

    Args:
        frames: [..., T, W] — T frames of length W each.
        hop:    frame stride in samples.

    Returns:
        [..., W + hop*(T-1)] signal.

    When `hop` divides W (all framework configs), this lowers to a pure
    reshape/pad/sum with no scatter: frame t is split into R=W//hop blocks,
    block r of frame t lands at output block (t + r).
    """
    *lead, T, W = frames.shape
    out_len = W + hop * (T - 1)
    if W % hop == 0:
        R = W // hop
        # [..., T, R, hop] -> per r: a length-T sequence of hop-blocks shifted by r
        blocks = frames.reshape(*lead, T, R, hop)
        total_blocks = T + R - 1  # output blocks
        out = jnp.zeros((*lead, total_blocks, hop), frames.dtype)
        for r in range(R):
            out = out.at[..., r : r + T, :].add(blocks[..., :, r, :])
        return out.reshape(*lead, total_blocks * hop)
    # General fallback: segment-sum via scatter-add on flat indices.
    idx = (jnp.arange(T)[:, None] * hop + jnp.arange(W)[None, :]).reshape(-1)
    flat = frames.reshape(*lead, T * W)
    out = jnp.zeros((*lead, out_len), frames.dtype)
    return out.at[..., idx].add(flat)


def window_sumsquare(window: jnp.ndarray, n_frames: int, hop: int, n_fft: int, power: int = 2) -> jnp.ndarray:
    """Sum of squared (or `power`-ed) windows across overlapping frames.

    Returns [n_fft + hop*(n_frames-1)] — the per-sample normalizer for iSTFT.
    """
    w = jnp.asarray(window).reshape(-1) ** power  # [n_fft]
    frames = jnp.broadcast_to(w[None, :], (n_frames, n_fft))
    return overlap_add(frames, hop)


def periodic_hann_sumsquare(n_fft: int, hop: int) -> np.ndarray:
    """Steady-state periodic window-sum-square normalizer for streaming
    iSTFT: one hop period of sum_k hann(n_fft)[k*hop : (k+1)*hop]**2
    (requires hop | n_fft). float32 [hop] — shared by the NS and SIMO
    streaming engines so their OLA normalizers can never diverge."""
    win = hann_window(n_fft).astype(np.float64) ** 2
    wsum = np.zeros(hop)
    for k in range(n_fft // hop):
        wsum += win[k * hop:(k + 1) * hop]
    return wsum.astype(np.float32)
