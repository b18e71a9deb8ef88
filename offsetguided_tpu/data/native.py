"""ctypes bindings for the native mask utilities
(offsetguided_tpu/native/rle.cpp — shipped as package source).

Auto-builds `librle.so` with g++ on first use, next to the source when that
directory is writable (source checkout) or in a per-user cache dir otherwise
(installed package in a read-only site-packages); transparently falls back
to the pure-Python implementation in data/coco.py when no toolchain exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), 'native')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lib_path() -> str:
    """Where librle.so lives (or should be built)."""
    here = os.path.join(_NATIVE_DIR, 'librle.so')
    if os.path.exists(here) or os.access(_NATIVE_DIR, os.W_OK):
        return here
    cache = os.path.join(
        os.environ.get('XDG_CACHE_HOME',
                       os.path.join(os.path.expanduser('~'), '.cache')),
        'offsetguided_tpu')
    return os.path.join(cache, 'librle.so')


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            src = os.path.join(_NATIVE_DIR, 'rle.cpp')
            if not os.path.exists(src):
                return None
            try:
                os.makedirs(os.path.dirname(lib_path), exist_ok=True)
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', lib_path, src],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None
        lib.rle_string_to_mask.restype = ctypes.c_int
        lib.rle_string_to_mask.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.rle_decode_counts.restype = ctypes.c_int
        lib.rle_decode_counts.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        lib.rle_mask_to_runs.restype = ctypes.c_int
        lib.rle_mask_to_runs.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rle_string_to_mask(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    """Compressed RLE string -> uint8 (h, w) mask; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.zeros((h, w), dtype=np.uint8)
    raw = counts.encode('ascii')
    rc = lib.rle_string_to_mask(
        raw, len(raw), h, w,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask if rc == 0 else None


def rle_encode_mask(mask: np.ndarray) -> Optional[np.ndarray]:
    """uint8 (h, w) mask -> uint32 column-major run lengths."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    runs = np.zeros(h * w + 2, dtype=np.uint32)
    n = lib.rle_mask_to_runs(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        runs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(runs))
    return runs[:n].copy() if n >= 0 else None
