"""ctypes binding for the native data loader (native/dataload.cpp).

Auto-builds the shared library on first use (g++, ~1 s); every entry point
has a pure-NumPy fallback so the framework never hard-depends on the
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwaedata.so"
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["bash", str(_NATIVE_DIR / "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.wae_load_batch.restype = ctypes.c_int
    lib.wae_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.wae_npy_shape.restype = ctypes.c_int
    lib.wae_npy_shape.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def npy_shape(path: str) -> tuple[int, int] | None:
    lib = _load()
    if lib is None:
        return None
    r, c = ctypes.c_int64(), ctypes.c_int64()
    if lib.wae_npy_shape(str(path).encode(), ctypes.byref(r), ctypes.byref(c)) != 0:
        return None
    return int(r.value), int(c.value)


def load_batch_native(
    wave_paths: list[str],
    feat_paths: list[str],
    max_steps: int,
    hop: int,
    cin_pad: int,
    feat_dim: int,
    seed: int,
    n_threads: int = 0,
):
    """Parallel mmap'd load + synchronized hop-aligned random crop of a
    whole batch. Returns (x (B, max_steps) int32, c (B, frames, D) f32) or
    None when the native lib is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    B = len(wave_paths)
    frames = max_steps // hop + 2 * cin_pad
    x = np.empty((B, max_steps), np.int32)
    c = np.empty((B, frames, feat_dim), np.float32)
    wv = (ctypes.c_char_p * B)(*[str(p).encode() for p in wave_paths])
    ft = (ctypes.c_char_p * B)(*[str(p).encode() for p in feat_paths])
    rc = lib.wae_load_batch(
        wv, ft, B, max_steps, hop, cin_pad, feat_dim,
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads or (os.cpu_count() or 2),
    )
    if rc != 0:
        raise RuntimeError(f"native loader failed with code {rc}")
    return x, c
