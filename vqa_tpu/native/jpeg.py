"""ctypes binding for the native batched JPEG decoder (jpeg_decoder.cpp).

The native engine decodes + resizes a whole batch on a C++ thread pool with
libjpeg DCT-domain scaling — the framework's replacement for the reference's
PIL-in-worker-processes input path (SURVEY.md N3/N4). The GIL is released
for the entire batch call.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "jpeg_decoder.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libvqa_jpeg.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB, "-ljpeg", "-pthread"],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.vqa_decode_batch.restype = ctypes.c_int
            lib.vqa_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_batch_native(paths: list[str], host_size: int,
                        threads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of JPEGs to uint8 [N, S, S, 3].

    Returns (images, ok_mask); failed decodes (missing/corrupt files) are
    zero-filled with ok_mask False, letting the caller substitute synthetic
    or PIL-decoded fallbacks.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native JPEG decoder unavailable (no toolchain/libjpeg)")
    n = len(paths)
    out = np.empty((n, host_size, host_size, 3), np.uint8)
    status = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vqa_decode_batch(arr, n,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         host_size, threads)
    return out, status.astype(bool)
