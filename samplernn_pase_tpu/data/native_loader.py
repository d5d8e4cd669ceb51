"""ctypes bindings for the native host-side data pipeline
(native/src/wavcodec.cpp): RIFF wav parse + fused mu-law quantization +
TBPTT chunk gather, with transparent pure-Python fallback.

The shared library is built on first use (`make -C native`); if the
toolchain or the .so is unavailable every entry point falls back to the
NumPy/scipy implementations, so the framework never hard-depends on the
native tier.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsrnn_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _open():
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.srnn_gather_windows  # newest symbol: stale-.so probe
        return lib
    except (OSError, AttributeError):
        return None


def _open_fresh():
    """Open the just-rebuilt .so. dlopen caches by path: if a STALE
    mapping of _LIB_PATH is already loaded in this process (the probe
    that triggered the rebuild), re-opening the same path returns the
    old handle — load a uniquely-named copy instead."""
    lib = _open()
    if lib is not None:
        return lib
    import os
    import shutil
    import tempfile
    try:
        tmp = (Path(tempfile.mkdtemp(prefix="srnn_native_"))
               / f"libsrnn_native_{os.getpid()}.so")
        shutil.copy2(_LIB_PATH, tmp)
        lib = ctypes.CDLL(str(tmp))
        lib.srnn_gather_windows
        return lib
    except (OSError, AttributeError):
        return None


def _register(lib):
    lib.srnn_mulaw_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32]
    lib.srnn_mulaw_decode.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int32]
    lib.srnn_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.srnn_read_wav.restype = ctypes.c_int64
    lib.srnn_load_quantized.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.srnn_load_quantized.restype = ctypes.c_int64
    lib.srnn_gather_windows.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib = _open() if _LIB_PATH.exists() else None
    if lib is None:
        # missing or stale (predates the current symbol set): rebuild
        _LIB_PATH.unlink(missing_ok=True)
        if not _build():
            return None
        lib = _open_fresh()
    if lib is None:
        return None
    _register(lib)
    _lib = lib
    return _lib


def available(build: bool = True) -> bool:
    """True when the native library is loadable. ``build=False`` NEVER
    runs `make` — hot paths that merely PREFER the native fast path
    (StreamBatcher's window gather) must not block their first call on
    a build subprocess. A healthy prebuilt .so is still picked up (and
    registered) on this path; a stale/corrupt one is left for a later
    ``build=True`` call to rebuild."""
    global _lib, _tried
    if not build:
        if _lib is not None or _tried:
            return _lib is not None
        if not _LIB_PATH.exists():
            return False
        lib = _open()
        if lib is None:
            return False     # stale/corrupt: keep _tried False so a
                             # build=True call can still rebuild
        _register(lib)
        _lib, _tried = lib, True
        return True
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def mulaw_encode(x: np.ndarray, q_levels: int = 256) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        from samplernn_pase_tpu.data.dataset import _quantize_host
        return _quantize_host(x, q_levels)
    out = np.empty(x.shape, np.int32)
    lib.srnn_mulaw_encode(_fptr(x.ravel()), _iptr(out.ravel()),
                          x.size, q_levels)
    return out


def mulaw_decode(lv: np.ndarray, q_levels: int = 256) -> np.ndarray:
    lib = _load()
    lv = np.ascontiguousarray(lv, np.int32)
    if lib is None:
        mu = float(q_levels - 1)
        y = 2.0 * (lv.astype(np.float64) / mu) - 1.0
        return (np.sign(y) * np.expm1(np.abs(y) * np.log1p(mu))
                / mu).astype(np.float32)
    out = np.empty(lv.shape, np.float32)
    lib.srnn_mulaw_decode(_iptr(lv.ravel()), _fptr(out.ravel()),
                          lv.size, q_levels)
    return out


def read_wav(path) -> tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        from samplernn_pase_tpu.ops.audio_io import read_wav as rw
        return rw(path)
    sr = ctypes.c_int32(0)
    n = lib.srnn_read_wav(str(path).encode(), None, 0,
                          ctypes.byref(sr))
    if n < 0:  # unsupported encoding -> scipy fallback
        from samplernn_pase_tpu.ops.audio_io import read_wav as rw
        return rw(path)
    out = np.empty(int(n), np.float32)
    got = lib.srnn_read_wav(str(path).encode(), _fptr(out), n,
                            ctypes.byref(sr))
    return out[:max(got, 0)], int(sr.value)


def gather_windows(addrs: np.ndarray, w: int,
                   out: np.ndarray | None = None) -> np.ndarray | None:
    """Batched TBPTT window gather (StreamBatcher hot path).

    addrs: int64 [B] array of host addresses, each pointing at `w`
    contiguous int32 levels (views into the pre-padded utterance
    streams). Returns int32 [B, w], or None when the native library is
    unavailable (caller falls back to np.stack)."""
    lib = _load()
    if lib is None:
        return None
    b = addrs.shape[0]
    if out is None:
        out = np.empty((b, w), np.int32)
    lib.srnn_gather_windows(
        addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b, w,
        _iptr(out))
    return out


def load_quantized(path, q_levels: int = 256) -> tuple[np.ndarray, int]:
    """wav file -> (mu-law levels int32, sample_rate), fused native pass."""
    lib = _load()
    if lib is None:
        from samplernn_pase_tpu.ops.audio_io import read_wav as rw
        from samplernn_pase_tpu.data.dataset import _quantize_host
        x, sr = rw(path)
        return _quantize_host(x, q_levels), sr
    sr = ctypes.c_int32(0)
    n = lib.srnn_read_wav(str(path).encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        from samplernn_pase_tpu.ops.audio_io import read_wav as rw
        from samplernn_pase_tpu.data.dataset import _quantize_host
        x, sr2 = rw(path)
        return _quantize_host(x, q_levels), sr2
    out = np.empty(int(n), np.int32)
    got = lib.srnn_load_quantized(str(path).encode(), _iptr(out), n,
                                  q_levels, ctypes.byref(sr))
    return out[:max(got, 0)], int(sr.value)
