"""Host-side utilities: manifest/config loaders + convolution helpers.

Parity: puresound/src/utils.py.
"""
from __future__ import annotations

import io
import os
from typing import Dict, List, Optional

import numpy as np
import yaml


def str2bool(v: str) -> bool:
    return v.lower() in ("true", "yes")


def str2list(s: str) -> List[str]:
    return s.strip().split()


def load_text_as_dict(file_path: str, separator: str = " ",
                      coding: str = "utf8") -> Dict:
    """Kaldi-style .scp loader: first column keys, rest as list values."""
    dct = {}
    with io.open(file_path, "r", encoding=coding) as f:
        for line in f.readlines():
            parts = line.strip().split(separator)
            dct[parts[0]] = parts[1:]
    return dct


def recursive_read_folder(folder: str, file_type: str,
                          output: Optional[List]) -> None:
    """List '<name> <path>' entries for every matching file under folder."""
    for file in os.listdir(folder):
        cur = os.path.join(folder, file)
        if os.path.isdir(cur):
            recursive_read_folder(cur, file_type, output)
        elif file_type in file:
            output.append(f"{file} {cur}")


def load_hparam(filename: str) -> Dict:
    """Multi-document YAML -> flat dict."""
    with open(filename, "r") as stream:
        docs = yaml.load_all(stream, Loader=yaml.FullLoader)
        hparam = {}
        for doc in docs:
            for k, v in doc.items():
                hparam[k] = v
    return hparam


def create_folder(folder_name: str) -> None:
    os.makedirs(folder_name, exist_ok=True)


_NEXT_FAST_LEN = {}


def next_fast_len(size: int) -> int:
    """Next 5-smooth number >= size (efficient FFT length)."""
    if size in _NEXT_FAST_LEN:
        return _NEXT_FAST_LEN[size]
    n = size
    while True:
        rem = n
        for p in (2, 3, 5):
            while rem % p == 0:
                rem //= p
        if rem == 1:
            _NEXT_FAST_LEN[size] = n
            return n
        n += 1


def convolve(x: np.ndarray, filt: np.ndarray) -> np.ndarray:
    """Causal direct convolution, output length == input length.

    (The reference's conv1d path, utils.py:109 — torch conv1d correlates
    with a pre-flipped kernel, i.e. true convolution.)
    """
    full = np.convolve(x.reshape(-1), filt.reshape(-1), mode="full")
    return full[: x.reshape(-1).shape[0]].reshape(1, -1)


def fftconvolve(x: np.ndarray, kernel: np.ndarray, mode: str = "full") -> np.ndarray:
    """rFFT-based convolution over the last axis (utils.py:152)."""
    m = x.shape[-1]
    n = kernel.shape[-1]
    if mode == "full":
        truncate = m + n - 1
    elif mode == "valid":
        truncate = max(m, n) - min(m, n) + 1
    elif mode == "same":
        truncate = max(m, n)
    else:
        raise ValueError(f"Unknown mode: {mode}")
    size = next_fast_len(m + n - 1)
    out = np.fft.irfft(np.fft.rfft(x, n=size) * np.fft.rfft(kernel, n=size), n=size)
    start = (m + n - 1 - truncate) // 2
    return out[..., start : start + truncate]
