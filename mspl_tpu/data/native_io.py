"""ctypes bindings for the native C++ IO runtime (native/mspl_io.cc).

The shared library is built on demand with g++ (zlib is the only
dependency) and cached under native/build/.  Every entry point has a PIL
fallback so the framework works without a toolchain; `available()` reports
which path is active.  The native path removes Python/PIL from the decode
loop entirely: N files are decoded + resized by C++ threads straight into
one preallocated uint8 batch buffer (the array jax.device_put stages to the
TPU).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "mspl_io.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmspl_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-pthread", _SRC, "-lz",
           "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        lib.mspl_decode_png_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mspl_decode_png_file.restype = ctypes.c_int
        lib.mspl_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.mspl_decode_png_batch.restype = ctypes.c_int
        lib.mspl_encode_png_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mspl_encode_png_file.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str, size_hw: Tuple[int, int], channels: int = 3,
               bilinear: bool = True) -> np.ndarray:
    """Decode (and resize) one PNG to uint8 [h, w, channels] (or [h, w])."""
    lib = _load()
    h, w = size_hw
    if lib is None:
        return _pil_decode(path, size_hw, channels, bilinear)
    out = np.empty((h, w, channels), np.uint8)
    rc = lib.mspl_decode_png_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, channels, 1 if bilinear else 0)
    if rc != 0:
        return _pil_decode(path, size_hw, channels, bilinear)
    return out[..., 0] if channels == 1 else out


def decode_png_batch(paths: Sequence[str], size_hw: Tuple[int, int],
                     channels: int = 3, bilinear: bool = True,
                     num_threads: int = 8) -> np.ndarray:
    """Decode a batch of PNGs in parallel into one [n, h, w, c] buffer."""
    lib = _load()
    h, w = size_hw
    n = len(paths)
    if lib is None:
        return np.stack([
            np.atleast_3d(decode_png(p, size_hw, channels, bilinear))
            for p in paths
        ])
    out = np.empty((n, h, w, channels), np.uint8)
    rcs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.mspl_decode_png_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, channels, 1 if bilinear else 0, num_threads,
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:  # fall back per-file for robustness (non-PNG inputs etc.)
        return np.stack([
            np.atleast_3d(decode_png(p, size_hw, channels, bilinear))
            for p in paths
        ])
    return out


def encode_png(path: str, img: np.ndarray) -> None:
    """Write uint8 [h,w] (gray) or [h,w,3] (RGB) as PNG."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    c = 1 if img.ndim == 2 else img.shape[2]
    if lib is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        rc = lib.mspl_encode_png_file(
            path.encode(),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img.shape[0], img.shape[1], c)
        if rc == 0:
            return
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img if img.ndim == 2 else img).save(path)


def _pil_decode(path, size_hw, channels, bilinear):
    from PIL import Image

    h, w = size_hw
    with Image.open(path) as im:
        im = im.convert("RGB" if channels == 3 else "L")
        if im.size != (w, h):
            im = im.resize((w, h),
                           Image.BILINEAR if bilinear else Image.NEAREST)
        arr = np.asarray(im, np.uint8)
    return arr
