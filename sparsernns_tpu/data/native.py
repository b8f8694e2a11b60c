"""ctypes bindings for the native WAV decode library (csrc/ndns_wavio.cpp).

Auto-builds with the in-tree Makefile on first use when a compiler is
available; degrades to the pure-python `wave` reader otherwise, so the
framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libndnswavio.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_CSRC, "Makefile")):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ndns_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.ndns_decode_wav.restype = ctypes.c_int
        lib.ndns_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.ndns_decode_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_wav(path: str, clip_len: int) -> Tuple[np.ndarray, int]:
    """Decode one PCM16 WAV into float32[clip_len] (pad/trim)."""
    lib = _load()
    out = np.empty(clip_len, np.float32)
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    rc = lib.ndns_decode_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clip_len)
    if rc < 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out, rc


def decode_batch(paths: List[str], clip_len: int,
                 n_threads: int = 0) -> np.ndarray:
    """Decode a batch of WAVs concurrently -> float32 (n, clip_len)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    n = len(paths)
    out = np.empty((n, clip_len), np.float32)
    results = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ndns_decode_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clip_len, n_threads,
        results.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if failures:
        bad = [paths[i] for i in range(n) if results[i] < 0]
        raise IOError(f"native decode failed for {len(bad)} files: "
                      f"{bad[:3]}")
    return out
