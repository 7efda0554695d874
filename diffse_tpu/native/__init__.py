"""Native (C++) runtime components, bound via ctypes.

Compiled lazily with g++ on first use (the analog of the reference's
torch.utils.cpp_extension JIT load, op/upfirdn2d.py:10-16); every consumer
gates on :func:`loader.available` and falls back to the pure-python path, so
the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdiffse_native.so")
_SOURCES = ["wav_loader.cpp", "upfirdn2d_ref.cpp"]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = (
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH]
        + [os.path.join(_HERE, s) for s in _SOURCES]
    )
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            src_mtime = max(os.path.getmtime(os.path.join(_HERE, s)) for s in _SOURCES)
            ok = _build()
            if not ok:
                _build_failed = True
                return None
        elif any(
            os.path.getmtime(os.path.join(_HERE, s)) > os.path.getmtime(_LIB_PATH)
            for s in _SOURCES
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.wav_read_mono.restype = ctypes.c_long
        lib.wav_read_mono.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_remix_crop.restype = None
        lib.wav_remix_crop.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_load_pair.restype = ctypes.c_int
        lib.wav_load_pair.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.upfirdn2d_f32.restype = None
        lib.upfirdn2d_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ] + [ctypes.c_long] * 10
        _lib = lib
        return _lib


class loader:
    """Namespace for the native WAV fast path (used by data/dataset.py)."""

    @staticmethod
    def available() -> bool:
        return get_lib() is not None

    @staticmethod
    def read_wav_mono(path: str) -> np.ndarray:
        lib = get_lib()
        sr = ctypes.c_int(0)
        n = lib.wav_read_mono(path.encode(), None, 0, ctypes.byref(sr))
        if n < 0:
            raise IOError(f"native wav decode failed for {path}")
        out = np.empty(n, dtype=np.float32)
        got = lib.wav_read_mono(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            ctypes.byref(sr),
        )
        if got != n:
            raise IOError(f"native wav decode short-read for {path}")
        return out

    @staticmethod
    def wav_len(path: str) -> int:
        """Cheap header probe: number of mono samples (no sample decode)."""
        lib = get_lib()
        sr = ctypes.c_int(0)
        n = lib.wav_read_mono(path.encode(), None, 0, ctypes.byref(sr))
        if n < 0:
            raise IOError(f"native wav probe failed for {path}")
        return int(n)

    @staticmethod
    def load_pair(clean_path: str, noisy_path: str, u: float, shuffle: bool,
                  fixed_snr: float, target_len: int):
        """Fused dataset item: decode pair + remix + random/center crop/pad in
        one GIL-released call (the Specs.__getitem__ contract)."""
        lib = get_lib()
        out_x = np.empty(target_len, dtype=np.float32)
        out_y = np.empty(target_len, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        rc = lib.wav_load_pair(
            clean_path.encode(), noisy_path.encode(), ctypes.c_double(u),
            1 if shuffle else 0, ctypes.c_float(fixed_snr), int(target_len),
            out_x.ctypes.data_as(fp), out_y.ctypes.data_as(fp),
        )
        if rc != 0:
            raise IOError(f"native pair load failed for {clean_path} / {noisy_path}")
        return out_x, out_y

    @staticmethod
    def remix_crop(x: np.ndarray, y: np.ndarray, fixed_snr: float,
                   target_len: int, start: int = -1):
        lib = get_lib()
        x = np.ascontiguousarray(x, dtype=np.float32)
        y = np.ascontiguousarray(y, dtype=np.float32)
        out_x = np.empty(target_len, dtype=np.float32)
        out_y = np.empty(target_len, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.wav_remix_crop(
            x.ctypes.data_as(fp), y.ctypes.data_as(fp), x.shape[0],
            ctypes.c_float(fixed_snr), target_len, start,
            out_x.ctypes.data_as(fp), out_y.ctypes.data_as(fp),
        )
        return out_x, out_y


def upfirdn2d_native(x: np.ndarray, kernel: np.ndarray, up: int = 1,
                     down: int = 1, pad=(0, 0)) -> np.ndarray:
    """C++ reference upfirdn2d (NCHW float32); parity anchor for the XLA op."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    kernel = np.ascontiguousarray(kernel, dtype=np.float32)
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    out_h = (in_h * up + pad[0] + pad[1] - kh) // down + 1
    out_w = (in_w * up + pad[0] + pad[1] - kw) // down + 1
    out = np.empty((n, c, out_h, out_w), dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.upfirdn2d_f32(
        x.ctypes.data_as(fp), kernel.ctypes.data_as(fp), out.ctypes.data_as(fp),
        n, c, in_h, in_w, kh, kw, up, down, pad[0], pad[1],
    )
    return out
