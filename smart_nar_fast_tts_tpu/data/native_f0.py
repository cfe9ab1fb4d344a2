"""ctypes binding for the native C++ F0 tracker (``native/f0/f0.cc``).

Replaces the reference's PyWORLD C++ dependency
(``preprocessor/preprocessor.py:181-186``) with an in-repo native module:
``estimate_f0_native`` compiles the shared library on first use (g++,
cached under ``native/f0/``) and falls back transparently to the numpy
oracle (``data/pitch.py``) when no toolchain is available, so preprocessing
works everywhere and is fast where it matters (corpus-scale offline runs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from .pitch import estimate_f0 as _estimate_f0_numpy

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "f0" / "f0.cc"
_LIB = _REPO_ROOT / "native" / "f0" / "libsmartf0.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB.exists() or (_SRC.exists()
                                 and _SRC.stat().st_mtime
                                 > _LIB.stat().st_mtime):
            if not _SRC.exists() or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.smart_f0_estimate.restype = ctypes.c_int
        lib.smart_f0_estimate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def estimate_f0_native(wav: np.ndarray, sampling_rate: int, hop_length: int,
                       f0_floor: float = 71.0, f0_ceil: float = 800.0,
                       nccf_threshold: float = 0.30) -> np.ndarray:
    """Same contract as ``data.pitch.estimate_f0``; C++ when available."""
    lib = _load()
    if lib is None or os.environ.get("SMART_TTS_NATIVE_F0") == "off":
        return _estimate_f0_numpy(wav, sampling_rate, hop_length,
                                  f0_floor, f0_ceil, nccf_threshold)
    wav64 = np.ascontiguousarray(wav, np.float64)
    n_frames = len(wav64) // hop_length + 1
    out = np.empty(n_frames, np.float64)
    rc = lib.smart_f0_estimate(
        wav64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(wav64)), sampling_rate, hop_length,
        f0_floor, f0_ceil, nccf_threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n_frames))
    if rc != 0:  # defensive; only hit on malformed inputs
        return _estimate_f0_numpy(wav, sampling_rate, hop_length,
                                  f0_floor, f0_ceil, nccf_threshold)
    return out
