"""Native (C++) host runtime: audio decode/resample for the data pipeline.

Compiled on first use with g++ into a per-user cache; falls back cleanly to
the pure-python path when a toolchain is unavailable (``load_library``
returns None).  The ctypes calls release the GIL, so the Python prefetch
threads in data/dataset.py scale across cores without worker processes
(the reference needed 16 DataLoader processes, train.py:95-103).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "wavio.cc")


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("DTTS_NATIVE_CACHE",
                           os.path.expanduser("~/.cache/detail_tts_tpu"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"libdttswavio-{digest}.so")


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("DTTS_NO_NATIVE"):
            return None
        try:
            so = _cache_path()
            if not os.path.exists(so):
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            lib.dtts_load_wav.restype = ctypes.c_long
            lib.dtts_load_wav.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long)]
            lib.dtts_resample.restype = ctypes.c_long
            lib.dtts_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long)]
            lib.dtts_free.restype = None
            lib.dtts_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def load_wav_native(path: str, target_sr: int) -> Optional[np.ndarray]:
    """Decode+resample via the native library; None on any failure."""
    lib = load_library()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    length = ctypes.c_long(0)
    rc = lib.dtts_load_wav(path.encode(), target_sr,
                           ctypes.byref(data), ctypes.byref(length))
    if rc != 0:
        return None
    try:
        out = np.ctypeslib.as_array(data, shape=(length.value,)).copy()
    finally:
        lib.dtts_free(data)
    return out
