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


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return _decode("decode_flac", f.read())


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return _decode("decode_wav", f.read())
