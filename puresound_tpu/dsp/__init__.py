from .stft import (
    fourier_kernels,
    hann_window,
    hz_to_mel,
    mel_to_hz,
    mel_filterbank,
    mel_frequencies,
    fft_frequencies,
    overlap_add,
    window_sumsquare,
)

__all__ = [
    "fourier_kernels",
    "hann_window",
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "mel_frequencies",
    "fft_frequencies",
    "overlap_add",
    "window_sumsquare",
]
