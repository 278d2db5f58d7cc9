"""ctypes bindings for the native C++ audio runtime (native/audio_kernels.cpp).

The library builds lazily on first use (g++ is part of the toolchain); every
entry point has a numpy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libmossaudio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "audio_kernels.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(_SO_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.resample_poly.restype = ctypes.c_int64
        lib.resample_poly.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                      ctypes.c_int32, ctypes.c_int32, f32p,
                                      ctypes.c_int64]
        lib.crossfade.restype = ctypes.c_int64
        lib.crossfade.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                  ctypes.c_int64, f32p]
        lib.float_to_pcm16.restype = None
        lib.float_to_pcm16.argtypes = [f32p, ctypes.c_int64, i16p]
        lib.pcm16_to_float.restype = None
        lib.pcm16_to_float.argtypes = [i16p, ctypes.c_int64, f32p]
        lib.loudness_gain.restype = ctypes.c_float
        lib.loudness_gain.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                      ctypes.c_float, ctypes.c_float]
        lib.apply_gain.restype = None
        lib.apply_gain.argtypes = [f32p, ctypes.c_int64, ctypes.c_float]
        _lib = lib
        return _lib


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_native(wav: np.ndarray, orig_sr: int, new_sr: int,
                    half_width: int = 32) -> Optional[np.ndarray]:
    """Polyphase resample via the C++ kernel; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from math import gcd

    g = gcd(int(orig_sr), int(new_sr))
    up, down = new_sr // g, orig_sr // g
    x = np.ascontiguousarray(wav, np.float32)
    n_out = (x.size * up + down - 1) // down
    out = np.empty(n_out, np.float32)
    written = lib.resample_poly(_f32(x), x.size, up, down, half_width, _f32(out), n_out)
    if written < 0:
        return None
    return out[:written]


def crossfade_native(prev_tail: np.ndarray, wav: np.ndarray,
                     n_overlap: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(prev_tail, np.float32)
    w = np.ascontiguousarray(wav, np.float32)
    n_overlap = min(n_overlap, p.size, w.size)
    out = np.empty(p.size + w.size - n_overlap, np.float32)
    lib.crossfade(_f32(p), p.size, _f32(w), w.size, n_overlap, _f32(out))
    return out


def float_to_pcm16(wav: np.ndarray) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(wav, np.float32)
    if lib is None:
        return np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    out = np.empty(x.size, np.int16)
    lib.float_to_pcm16(_f32(x), x.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out


def loudness_normalize_native(wav: np.ndarray, target_dbfs: float = -20.0,
                              gain_range=(-3.0, 3.0)) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(wav, np.float32).copy()
    gain = lib.loudness_gain(_f32(x), x.size, target_dbfs, gain_range[0], gain_range[1])
    lib.apply_gain(_f32(x), x.size, gain)
    return x
