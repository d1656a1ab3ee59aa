"""ctypes bindings for the native C++ data-pipeline library.

Builds lazily with `make` on first use if libdmb_native.so is missing; all
entry points raise ImportError -> callers fall back to the pure-Python path
(data/io.py), so the framework works without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdmb_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception as e:  # no toolchain / libpng-dev: stay Python
            raise ImportError(f"cannot build native library: {e}")
    lib = ctypes.CDLL(_SO)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.dmb_decode_pfm.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(fp), ip, ip, ip]
    lib.dmb_decode_png_rgb.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(fp), ip, ip]
    lib.dmb_decode_png_disp16.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(fp), ip, ip]
    lib.dmb_normalize_crop.argtypes = [fp] + [ctypes.c_int] * 7 + [fp, fp, fp]
    lib.dmb_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _take(ptr, shape):
    """Copy a malloc'd buffer into numpy and free it."""
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(np.float32,
                                                        copy=True)
    _lib.dmb_free(ptr)
    return arr.reshape(shape)


def available():
    try:
        _load()
        return True
    except ImportError:
        return False


def decode_pfm(path):
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.dmb_decode_pfm(path.encode(), ctypes.byref(out),
                            ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c))
    if rc != 0:
        raise IOError(f"dmb_decode_pfm({path}) failed with code {rc}")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, 3)
    return _take(out, shape)


def decode_png_rgb(path):
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.dmb_decode_png_rgb(path.encode(), ctypes.byref(out),
                                ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"dmb_decode_png_rgb({path}) failed with code {rc}")
    return _take(out, (h.value, w.value, 3))


def decode_png_disp16(path):
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.dmb_decode_png_disp16(path.encode(), ctypes.byref(out),
                                   ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(
            f"dmb_decode_png_disp16({path}) failed with code {rc}")
    return _take(out, (h.value, w.value))


def normalize_crop(src, y1, x1, th, tw, mean, std):
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    dst = np.empty((th, tw, c), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.dmb_normalize_crop(
        src.ctypes.data_as(fp), h, w, c, y1, x1, th, tw,
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        dst.ctypes.data_as(fp))
    return dst
