"""ctypes bindings for the native (C++) host-pipeline components.

csrc/audio_decode.cpp provides fast FLAC/WAV decoding for the data loader
(the pure-Python FLAC decoder is ~100x slower). Falls back gracefully when
the shared library hasn't been built; `build()` compiles it on demand with
the system toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpuresound_audio.so")

_lib = None
_tried = False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    built = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_CSRC):
        if name.endswith(".cpp") and \
                os.path.getmtime(os.path.join(_CSRC, name)) > built:
            return True
    return False


def build(force: bool = False) -> bool:
    """Compile the native library (make -C csrc). Returns success."""
    if not force and not _stale():
        return True
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, text=True)
        return True
    except Exception as e:  # pragma: no cover
        print(f"native build failed: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale():
        if not build() and not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    for name in ("decode_flac", "decode_wav"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                       ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                       ctypes.POINTER(ctypes.c_int64),
                       ctypes.POINTER(ctypes.c_int),
                       ctypes.POINTER(ctypes.c_int)]
        fn.restype = ctypes.c_int
    lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.free_buffer.restype = None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ps_resample_len.argtypes = [ctypes.c_int64] * 3
    lib.ps_resample_len.restype = ctypes.c_int64
    lib.ps_resample_poly_f32.argtypes = [f32p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int64,
                                         f32p]
    lib.ps_resample_poly_f32.restype = ctypes.c_int
    lib.ps_biquad_f32.argtypes = [f32p, f32p, f32p, ctypes.c_int64, f32p]
    lib.ps_biquad_f32.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _decode(fn_name: str, raw: bytes) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    out = ctypes.POINTER(ctypes.c_float)()
    total = ctypes.c_int64()
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    rc = getattr(lib, fn_name)(buf, len(raw), ctypes.byref(out),
                               ctypes.byref(total), ctypes.byref(channels),
                               ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"{fn_name} failed with code {rc}")
    n = total.value * channels.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.free_buffer(out)
    return arr.reshape(channels.value, total.value), sr.value


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly-equivalent polyphase resampler along the
    last axis (kaiser-5.0 lowpass, f32). Taps are cached per (up, down)
    in the library — scipy rebuilds the ~200k-tap filter every call,
    which dominates the Python speed-perturb cost in loader workers."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    ny = lib.ps_resample_len(flat.shape[1], up, down)
    out = np.empty((flat.shape[0], ny), np.float32)
    for r in range(flat.shape[0]):
        rc = lib.ps_resample_poly_f32(flat[r], flat.shape[1], up, down,
                                      out[r])
        if rc != 0:
            raise ValueError(f"ps_resample_poly_f32 failed ({rc})")
    return out.reshape(lead + (ny,))


def biquad(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """lfilter(b, a, x) for order-2 IIR along the last axis, float32
    (direct form II transposed, zero initial state)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if a.shape != (3,) or b.shape != (3,):
        raise ValueError("biquad expects 3-tap a/b")
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty_like(flat)
    for r in range(flat.shape[0]):
        lib.ps_biquad_f32(b, a, flat[r], flat.shape[1], out[r])
    return out.reshape(lead + (flat.shape[1],))


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return _decode("decode_flac", f.read())


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return _decode("decode_wav", f.read())
