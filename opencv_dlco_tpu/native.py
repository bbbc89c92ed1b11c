"""ctypes binding for the native data-plane runtime (native/dlco_native.cpp).

Auto-builds libdlco_native.so with make on first use (g++ is part of the
toolchain); every entry point has a pure-Python fallback used when the
native library is unavailable, so the framework degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdlco_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dlco_version.restype = ctypes.c_int
        lib.dlco_bmp_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.dlco_bmp_load_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int]
        lib.dlco_load_patch_sheets.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dlco_parse_m50.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
        lib.dlco_parse_m50.restype = ctypes.c_long
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def bmp_load_gray(path: str) -> np.ndarray:
    """Decode a BMP to a grayscale uint8 (H, W) array via the native lib."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.dlco_bmp_probe(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"bmp probe failed ({rc}): {path}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.dlco_bmp_load_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value, h.value)
    if rc != 0:
        raise IOError(f"bmp decode failed ({rc}): {path}")
    return out


def load_patch_sheets(paths: Sequence[str], patch: int = 64, grid: int = 16,
                      n_threads: int = 0) -> np.ndarray:
    """Decode sheets and crop their patch grids: (len(paths)*grid^2, P, P).

    Multithreaded native path; numpy+cv2 fallback.
    """
    lib = _load()
    n = len(paths)
    out = np.empty((n * grid * grid, patch, patch), np.uint8)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.dlco_load_patch_sheets(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            patch, grid, n_threads)
        if rc != 0:
            raise IOError(f"sheet load failed ({rc})")
        return out
    # fallback
    import cv2

    from .data.brown import crop_patch_grid

    for i, p in enumerate(paths):
        sheet = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if sheet is None:
            raise IOError(p)
        out[i * grid * grid:(i + 1) * grid * grid] = crop_patch_grid(
            sheet, grid * grid)
    return out


def parse_m50(path: str, max_rows: int = 2_000_000) -> np.ndarray:
    """Fast m50 pair-index parse -> (N, 4) int32; numpy fallback."""
    lib = _load()
    if lib is None:
        from .data.brown import parse_pair_index

        return parse_pair_index(path)
    out = np.empty((max_rows, 4), np.int32)
    n = lib.dlco_parse_m50(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_rows)
    if n < 0:
        raise IOError(path)
    return out[:n].copy()
