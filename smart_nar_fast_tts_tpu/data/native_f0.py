"""ctypes binding for the native C++ F0 modules (``native/f0/``).

Replaces the reference's PyWORLD C++ dependency
(``preprocessor/preprocessor.py:181-186``) with an in-repo native module:
``estimate_f0_native`` compiles the shared library on first use (g++,
cached under ``native/f0/``) and falls back transparently to the numpy
oracles (``data/world_f0.py`` / ``data/pitch.py``) when no toolchain is
available, so preprocessing works everywhere and is fast where it matters
(corpus-scale offline runs).

Two algorithms are compiled into ``libsmartf0.so``:

- ``world`` (default) — DIO + StoneMask (``world_f0.cc``), the same
  algorithm family PyWORLD runs, so pitch targets and ``stats.json`` stay
  distribution-compatible with the reference (VERDICT.md Missing #1);
- ``nccf`` — the round-1 normalized-autocorrelation tracker (``f0.cc``),
  kept for comparison/ablation.

Select with ``SMART_TTS_F0=world|nccf`` (and ``SMART_TTS_NATIVE_F0=off``
to force the numpy paths).
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
from .world_f0 import estimate_f0_world as _estimate_f0_world_numpy

_F0_DIR = Path(__file__).resolve().parents[2] / "native" / "f0"
_SRCS = [_F0_DIR / "f0.cc", _F0_DIR / "world_f0.cc"]
_LIB = _F0_DIR / "libsmartf0.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", *[str(s) for s in _SRCS], "-o", str(_LIB)]
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
        stale = _LIB.exists() and any(
            s.exists() and s.stat().st_mtime > _LIB.stat().st_mtime
            for s in _SRCS)
        if not _LIB.exists() or stale:
            if not all(s.exists() for s in _SRCS) or not _build():
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
        lib.smart_world_f0.restype = ctypes.c_int
        lib.smart_world_f0.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.smart_stonemask.restype = ctypes.c_int
        lib.smart_stonemask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def estimate_f0_nccf_native(wav: np.ndarray, sampling_rate: int,
                            hop_length: int, f0_floor: float = 71.0,
                            f0_ceil: float = 800.0,
                            nccf_threshold: float = 0.30) -> np.ndarray:
    """Round-1 NCCF tracker; C++ when available, numpy oracle otherwise."""
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


def estimate_f0_world_native(wav: np.ndarray, sampling_rate: int,
                             hop_length: int, f0_floor: float = 71.0,
                             f0_ceil: float = 800.0,
                             channels_in_octave: float = 2.0,
                             allowed_range: float = 0.1) -> np.ndarray:
    """DIO + StoneMask (the reference's PyWORLD pipeline); C++ when
    available, numpy oracle (``data/world_f0.py``) otherwise."""
    lib = _load()
    if lib is None or os.environ.get("SMART_TTS_NATIVE_F0") == "off":
        return _estimate_f0_world_numpy(wav, sampling_rate, hop_length,
                                        f0_floor, f0_ceil)
    wav64 = np.ascontiguousarray(wav, np.float64)
    n_frames = len(wav64) // hop_length + 1
    out = np.empty(n_frames, np.float64)
    wp = wav64.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.smart_world_f0(
        wp, ctypes.c_int64(len(wav64)), sampling_rate, hop_length,
        f0_floor, f0_ceil, channels_in_octave, allowed_range,
        op, ctypes.c_int64(n_frames))
    if rc == 0:
        rc = lib.smart_stonemask(
            wp, ctypes.c_int64(len(wav64)), sampling_rate, hop_length,
            f0_floor, f0_ceil, op, ctypes.c_int64(n_frames))
    if rc != 0:  # defensive; only hit on malformed inputs
        return _estimate_f0_world_numpy(wav, sampling_rate, hop_length,
                                        f0_floor, f0_ceil)
    return out


def estimate_f0_native(wav: np.ndarray, sampling_rate: int, hop_length: int,
                       f0_floor: float = 71.0, f0_ceil: float = 800.0,
                       nccf_threshold: float = 0.30) -> np.ndarray:
    """Preprocessor entry point: DIO+StoneMask by default (PyWORLD-family,
    reference contract); ``SMART_TTS_F0=nccf`` selects the round-1
    tracker."""
    if os.environ.get("SMART_TTS_F0", "world") == "nccf":
        return estimate_f0_nccf_native(wav, sampling_rate, hop_length,
                                       f0_floor, f0_ceil, nccf_threshold)
    return estimate_f0_world_native(wav, sampling_rate, hop_length,
                                    f0_floor, f0_ceil)
