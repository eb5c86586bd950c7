"""Waveform <-> latent-feature front-ends (the encode/decode DSP kernels).

Three families, mirroring the reference API surface
(puresound/nnet/lobe/encoder.py):

- `FreeEncDec`   — learned filterbank: strided conv encode, transposed-conv
                   decode (encoder.py:16-94).
- `ConvEncDec`   — trainable conv-STFT with exact iSTFT
                   (ConvSTFT, encoder.py:97-457).
- `FbankEnc`     — trainable conv mel-spectrogram with pinv-mel inverse
                   (ConvMelSpectrogram, encoder.py:459-599).

TPU-first design notes: the analysis transform is expressed as a strided
conv (XLA lowers it to an implicit-im2col matmul on the MXU); synthesis is a
frame matmul against the fixed inverse-DFT basis followed by a reshape-sum
overlap-add (`dsp.overlap_add`) — no FFT ops, no scatters, everything fuses.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import (
    fourier_kernels,
    hann_window,
    inverse_fourier_basis,
    mel_filterbank,
    overlap_add,
    window_sumsquare,
)


def _conv1d_strided(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """VALID strided 1-D conv. x: [N, Ci, L], w: [Co, Ci, K] -> [N, Co, T]."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def _conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Transposed 1-D conv matching torch ConvTranspose1d(padding=0).

    x: [N, Ci, T], w: [Ci, Co, K] -> [N, Co, K + stride*(T-1)].
    Implemented as input-dilated conv with the spatially-flipped kernel.
    """
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [Co, Ci, K]
    return jax.lax.conv_general_dilated(
        x, w_flip.astype(x.dtype), window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
    )


class FreeEncDec(nn.Module):
    """Learned (unconstrained) analysis/synthesis filterbank.

    forward: [N, L] -> [N, C, T]; inverse: [N, C, T] -> [N, L].
    Parity: puresound/nnet/lobe/encoder.py:16-94.
    """

    win_length: int = 512
    laten_length: int = 512
    hop_length: int = 128
    output_active: bool = False

    def setup(self):
        # torch Conv1d default init: U(-sqrt(k), sqrt(k)), k = 1/(Ci*K)
        k_enc = 1.0 / self.win_length
        self.enc_w = self.param(
            "enc_w",
            lambda key: jax.random.uniform(
                key, (self.laten_length, 1, self.win_length),
                minval=-np.sqrt(k_enc), maxval=np.sqrt(k_enc)),
        )
        k_dec = 1.0 / (self.laten_length * self.win_length)
        self.dec_w = self.param(
            "dec_w",
            lambda key: jax.random.uniform(
                key, (self.laten_length, 1, self.win_length),
                minval=-np.sqrt(k_dec), maxval=np.sqrt(k_dec)),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = _conv1d_strided(x[:, None, :], self.enc_w, self.hop_length)
        if self.output_active:
            feats = jax.nn.relu(feats)
        return feats

    def inverse(self, feats: jnp.ndarray) -> jnp.ndarray:
        wav = _conv_transpose1d(feats, self.dec_w, self.hop_length)
        return wav[:, 0, :]


class ConvSTFT(nn.Module):
    """Conv-STFT with (optionally trainable) windowed Fourier kernels.

    forward: [N, L] -> [N, F, T, 2] ("Complex": (re, im) with the standard
    DFT sign convention) or stacked (mag, phase) for "MagPhase".
    inverse: [N, F, T, 2] complex -> [N, L] via Hermitian extension, frame
    synthesis matmul, windowing, overlap-add, and window-sum-square division.

    Parity: puresound/nnet/lobe/encoder.py:275-457 (nnAudio-style).
    """

    n_fft: int = 2048
    win_length: Optional[int] = None
    freq_bins: Optional[int] = None
    hop_length: Optional[int] = None
    freq_scale: str = "no"
    iSTFT: bool = False
    fmin: float = 50.0
    fmax: float = 6000.0
    sr: int = 22050
    trainable: bool = False
    output_format: str = "Complex"
    win_type: str = "hann"

    @property
    def _win_length(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    @property
    def _hop(self) -> int:
        return self.hop_length if self.hop_length is not None else self._win_length // 4

    @property
    def num_freq_out(self) -> int:
        return self.freq_bins if self.freq_bins is not None else self.n_fft // 2 + 1

    def setup(self):
        if self._win_length > self.n_fft:
            raise ValueError("window length must be <= n_fft")
        wsin, wcos, _, _ = fourier_kernels(
            self.n_fft, win_length=self._win_length, freq_bins=self.freq_bins,
            fmin=self.fmin, fmax=self.fmax, sr=self.sr, freq_scale=self.freq_scale,
        )
        if self.win_type.lower() == "hann":
            window = hann_window(self._win_length)
        else:
            raise NotImplementedError(f"window type {self.win_type}")
        if self._win_length < self.n_fft:
            # Center-pad the window to n_fft (nnAudio semantics: the analysis
            # sinusoids always span n_fft samples and the shorter window is
            # zero-padded symmetrically).  The reference raises TypeError here
            # (puresound/nnet/lobe/encoder.py:339-340); we support the full
            # nnAudio surface instead — win_length == n_fft is unchanged.
            lpad = (self.n_fft - self._win_length) // 2
            window = np.pad(window, (lpad, self.n_fft - self._win_length - lpad))
        self._window_np = window
        wsin_w = wsin * window[None, :]
        wcos_w = wcos * window[None, :]
        if self.trainable:
            self.wsin = self.param("wsin", lambda _: jnp.asarray(wsin_w))
            self.wcos = self.param("wcos", lambda _: jnp.asarray(wcos_w))
        else:
            self.wsin = jnp.asarray(wsin_w)
            self.wcos = jnp.asarray(wcos_w)
        if self.iSTFT:
            # Fixed inverse-DFT synthesis basis (constant even when the
            # analysis kernels are trainable, matching the reference).
            cos_b, sin_b = inverse_fourier_basis(self.n_fft)
            self._cos_basis = cos_b  # [n_fft(freq), n_fft(time)]
            self._sin_basis = sin_b

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, L] -> [N, F, T, 2]."""
        w = jnp.concatenate([self.wcos, self.wsin], axis=0)[:, None, :]  # [2F,1,K]
        spec = _conv1d_strided(x[:, None, :], w, self._hop)  # [N, 2F, T]
        n_kernel_bins = self.wcos.shape[0]
        spec_real, spec_imag = spec[:, :n_kernel_bins], spec[:, n_kernel_bins:]
        fb = self.num_freq_out
        spec_real = spec_real[:, :fb, :]
        spec_imag = spec_imag[:, :fb, :]

        if self.output_format == "Complex":
            # DFT convention: imag = -sum(x*sin)
            return jnp.stack([spec_real, -spec_imag], axis=-1)
        elif self.output_format == "MagPhase":
            mags = spec_real**2 + spec_imag**2
            if self.trainable:
                mags = jnp.sqrt(mags + 1e-8)
            else:
                mags = jnp.sqrt(mags)
            phase = jnp.arctan2(-spec_imag, spec_real)
            return jnp.stack([mags, phase], axis=-1)
        raise NotImplementedError(self.output_format)

    # ------------------------------------------------------- streaming forms
    def stream_analysis_ri(self, buf: jnp.ndarray, K: int,
                           drop_first_bin: bool = True) -> jnp.ndarray:
        """Streaming analysis: buf [N, (K-1)*hop + n_fft] -> RI-stacked
        features [N, 2*(F - drop), K] in ONE matmul.

        The offline path's strided conv + bin slices + RI concat cost ~2 ms
        of glue at serving batch for a 2-frame chunk; here the K frames are
        static slices and the RI pack (incl. the DFT imag sign and the
        first-bin drop) is folded into the kernel matrix."""
        lo = 1 if drop_first_bin else 0
        fb = self.num_freq_out
        # [C, n_fft] with C = 2*(fb - lo): rows = [re bins lo.., im bins lo..]
        w = jnp.concatenate([self.wcos[lo:fb], -self.wsin[lo:fb]], axis=0)
        frames = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(buf, k * self._hop, self.n_fft,
                                          axis=1)
             for k in range(K)], axis=1)  # [N, K, n_fft]
        return jnp.einsum("nkt,ct->nck", frames, w.astype(buf.dtype))

    def stream_synthesis_frames(self, ri: jnp.ndarray,
                                drop_first_bin: bool = True) -> jnp.ndarray:
        """Streaming synthesis: RI-stacked spectra [N, C, K] -> windowed
        frames [N, K, n_fft] in ONE matmul.

        Folds the first-bin re-pad, Hermitian extension, inverse-DFT basis,
        window, and 1/n_fft scale into a single fixed [C, n_fft] matrix —
        replacing the split/pad/flip/concat + two einsums of the offline
        path. Mirrored interior bins contribute their cos/sin twice, so the
        basis rows are cos[f] + cos[n_fft - f] (and the imag rows
        -(sin[f] - sin[n_fft - f]))."""
        lo = 1 if drop_first_bin else 0
        fb = self.num_freq_out  # n_fft//2 + 1
        n = self.n_fft
        cos_b, sin_b = np.asarray(self._cos_basis), np.asarray(self._sin_basis)
        # doubling mask for Hermitian-mirrored interior bins 1..fb-2
        dbl = np.zeros((fb, n), np.float32)
        dbl[1:fb - 1] = 1.0
        cos_eff = cos_b[:fb] + dbl * cos_b[(n - np.arange(fb)) % n]
        sin_eff = -(sin_b[:fb] - dbl * sin_b[(n - np.arange(fb)) % n])
        basis = np.concatenate([cos_eff[lo:], sin_eff[lo:]], axis=0)
        basis = basis * self._window_np[None, :] / n
        return jnp.einsum("nck,cs->nks", ri, jnp.asarray(basis, ri.dtype))

    def synthesis_frames(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        """Per-frame synthesis (Hermitian extension + inverse-DFT matmul +
        window / n_fft) WITHOUT overlap-add — streaming engines OLA with a
        carry buffer. re/im: [N, F, T] -> [N, T, n_fft]."""
        if not self.iSTFT:
            raise ValueError("construct with iSTFT=True to use inverse()")
        # Hermitian extension: F = n_fft//2+1 -> n_fft
        re_full = jnp.concatenate([re, jnp.flip(re[:, 1:-1, :], axis=1)], axis=1)
        im_full = jnp.concatenate([im, -jnp.flip(im[:, 1:-1, :], axis=1)], axis=1)
        # frame[s] = sum_f re*cos - im*sin  (one [n_fft x n_fft] matmul)
        frames = jnp.einsum("nft,fs->nts", re_full, self._cos_basis) - jnp.einsum(
            "nft,fs->nts", im_full, self._sin_basis
        )  # [N, T, n_fft]
        window = jnp.asarray(self._window_np)
        return frames * window[None, None, :] / self.n_fft

    def _synthesize(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        """Hermitian-extend [N, F, T] spectra and synthesize the waveform."""
        frames = self.synthesis_frames(re, im)
        window = jnp.asarray(self._window_np)
        sig = overlap_add(frames, self._hop)  # [N, L]
        T = re.shape[2]
        w_sum = window_sumsquare(window, T, self._hop, self.n_fft)
        sig = jnp.where(w_sum[None, :] > 1e-10, sig / jnp.where(w_sum > 1e-10, w_sum, 1.0)[None, :], sig)
        return sig

    def inverse(self, X: jnp.ndarray) -> jnp.ndarray:
        """X: [N, F, T, 2] -> [N, L].

        "Complex" format: X stacks (re, im).  "MagPhase": X stacks
        (magnitude, phase) as produced by the forward pass — re-polarized to
        (mag*cos, mag*sin) before synthesis.  The reference only inverts
        Complex at the ConvSTFT level (encoder.py:421-424) and routes
        MagPhase reconstruction through ConvMelSpectrogram.inverse
        (encoder.py:550-598); here both live on ConvSTFT.
        """
        if X.ndim != 4:
            raise ValueError("inverse expects [N, freq, T, 2] input")
        if self.output_format == "Complex":
            return self._synthesize(X[..., 0], X[..., 1])
        elif self.output_format == "MagPhase":
            mag, phase = X[..., 0], X[..., 1]
            return self._synthesize(mag * jnp.cos(phase), mag * jnp.sin(phase))
        raise NotImplementedError(self.output_format)


class ConvEncDec(nn.Module):
    """Trainable conv-STFT front-end wrapper ([N, L] <-> [N, F, T, 2]).

    Parity: puresound/nnet/lobe/encoder.py:97-183.
    """

    fft_length: int = 512
    win_type: str = "hann"
    win_length: int = 512
    freq_bins: Optional[int] = None
    hop_length: int = 128
    freq_scale: str = "no"
    iSTFT: bool = True
    fmin: float = 0.0
    fmax: float = 8000.0
    sr: int = 16000
    trainable: bool = True
    output_format: str = "Complex"

    def setup(self):
        self.encoder = ConvSTFT(
            n_fft=self.fft_length, win_length=self.win_length,
            freq_bins=self.freq_bins, hop_length=self.hop_length,
            freq_scale=self.freq_scale, iSTFT=self.iSTFT, fmin=self.fmin,
            fmax=self.fmax, sr=self.sr, trainable=self.trainable,
            output_format=self.output_format, win_type=self.win_type,
        )

    @property
    def num_freq_out(self) -> int:
        return self.freq_bins if self.freq_bins is not None else self.fft_length // 2 + 1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)

    def inverse(self, X: jnp.ndarray) -> jnp.ndarray:
        return self.encoder.inverse(X)


class FbankEnc(nn.Module):
    """Trainable conv mel-spectrogram front-end.

    forward ("Magnitude"): [N, L] -> [N, n_banks, T] mel power features.
    forward ("MagPhase"):  returns (mel magnitude [N, n_banks, T], phase).
    inverse: (mag, phase) -> [N, L] via pinv-mel and iSTFT synthesis.

    Parity: puresound/nnet/lobe/encoder.py:186-272 + 459-599.
    """

    fft_length: int = 512
    win_type: str = "hann"
    win_length: int = 512
    freq_bins: Optional[int] = None
    hop_length: int = 128
    freq_scale: str = "no"
    fmin: float = 0.0
    fmax: float = 8000.0
    sr: int = 16000
    trainable: bool = False
    output_format: str = "Magnitude"
    n_banks: int = 80
    iSTFT: bool = False

    def setup(self):
        self.stft = ConvSTFT(
            n_fft=self.fft_length, win_length=self.win_length,
            freq_bins=self.freq_bins, hop_length=self.hop_length,
            freq_scale=self.freq_scale, iSTFT=self.iSTFT, fmin=self.fmin,
            fmax=self.fmax, sr=self.sr, trainable=self.trainable,
            output_format="Complex", win_type=self.win_type,
        )
        # NOTE: the reference hardcodes sr=16000 here regardless of the
        # configured rate (puresound/nnet/lobe/encoder.py:493-494) — a bug
        # for any non-16 kHz config; we honor self.sr (identical for every
        # zoo config, all of which run at 16 kHz).
        mel_fb = mel_filterbank(sr=self.sr, n_fft=self.fft_length, n_banks=self.n_banks)
        mel_fb_t = mel_fb.T  # [n_fft//2+1, n_banks]
        inv_mel = np.linalg.pinv(mel_fb_t).astype(np.float32)
        if self.trainable:
            self.filterbank = self.param("filterbank", lambda _: jnp.asarray(mel_fb_t))
            self.inv_filterbank = self.param("inv_filterbank", lambda _: jnp.asarray(inv_mel))
        else:
            self.filterbank = jnp.asarray(mel_fb_t)
            self.inv_filterbank = jnp.asarray(inv_mel)

    def __call__(self, x: jnp.ndarray):
        X = self.stft(x)  # [N, F, T, 2] complex (re, im)
        re, im = X[..., 0], X[..., 1]
        power = re**2 + im**2
        fmt = self.output_format.lower()
        if fmt == "magphase":
            mag = jnp.sqrt(power + 1e-8) if self.trainable else jnp.sqrt(power)
            mel = jnp.einsum("nft,fm->nmt", mag, self.filterbank)
            phase = jnp.arctan2(im, re)
            return mel, phase
        elif fmt == "magnitude":
            mag = power + 1e-8 if self.trainable else power
            mel = jnp.einsum("nft,fm->nmt", mag, self.filterbank)
            return mel
        raise NotImplementedError(self.output_format)

    def inverse(self, melspec: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        if self.output_format.lower() != "magphase":
            raise NotImplementedError("inverse only supports MagPhase format")
        spec = jnp.einsum("nmt,mf->nft", melspec, self.inv_filterbank)
        re = spec * jnp.cos(phase)
        im = spec * jnp.sin(phase)
        return self.stft._synthesize(re, im)
