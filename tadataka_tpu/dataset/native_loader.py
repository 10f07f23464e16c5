"""ctypes bindings for the native dataset prefetcher.

Builds lazily from ``native/`` on first use (g++ + zlib); falls back to
PIL decoding when the toolchain is unavailable, so the package never hard-
depends on the native library.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtadataka_native.so"
_lib = None


def _build():
    subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                   capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_shape.restype = ctypes.c_int
    lib.loader_shape.argtypes = [ctypes.c_void_p, ctypes.c_long] + \
        [ctypes.POINTER(ctypes.c_int)] * 4
    lib.loader_copy.restype = ctypes.c_int
    lib.loader_copy.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_long]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_png_file.restype = ctypes.c_int
    lib.decode_png_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available():
    try:
        _load()
        return True
    except Exception:
        return False


def _as_array(buf, w, h, ch, depth):
    dtype = np.uint16 if depth == 16 else np.uint8
    arr = np.frombuffer(buf, dtype=dtype).reshape(
        h, w, ch) if ch > 1 else np.frombuffer(buf, dtype=dtype).reshape(h, w)
    return arr


def imread_native(path):
    """Decode one PNG through the native decoder."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    depth = ctypes.c_int()
    # size query
    rc = lib.decode_png_file(str(path).encode(), None, 0,
                             ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(ch), ctypes.byref(depth))
    if rc != 0:
        raise IOError(f"png probe failed ({rc}) for {path}")
    nbytes = w.value * h.value * ch.value * (depth.value // 8)
    buf = (ctypes.c_uint8 * nbytes)()
    rc = lib.decode_png_file(str(path).encode(), buf, nbytes,
                             ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(ch), ctypes.byref(depth))
    if rc != 0:
        raise IOError(f"png decode failed ({rc}) for {path}")
    return _as_array(buf, w.value, h.value, ch.value, depth.value).copy()


class PrefetchingLoader:
    """Ordered decode-ahead iteration over a list of PNG paths.

    Workers decode up to ``capacity`` frames ahead; ``__getitem__`` must be
    consumed in order (the prefetch window advances with consumption).
    """

    def __init__(self, paths, n_threads=2, capacity=8):
        self._lib = _load()
        self.paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._handle = self._lib.loader_create(arr, len(self.paths),
                                               n_threads, capacity)
        self._next = 0

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for i in range(len(self.paths)):
            yield self[i]

    def __getitem__(self, index):
        if index != self._next:
            raise IndexError(
                f"PrefetchingLoader is in-order: expected {self._next}, "
                f"got {index}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        depth = ctypes.c_int()
        rc = self._lib.loader_shape(self._handle, index,
                                    ctypes.byref(w), ctypes.byref(h),
                                    ctypes.byref(ch), ctypes.byref(depth))
        if rc != 0:
            raise IOError(f"decode failed ({rc}) for {self.paths[index]}")
        nbytes = w.value * h.value * ch.value * (depth.value // 8)
        buf = (ctypes.c_uint8 * nbytes)()
        rc = self._lib.loader_copy(self._handle, index, buf, nbytes)
        if rc != 0:
            raise IOError(f"copy failed ({rc})")
        self._next = index + 1
        return _as_array(buf, w.value, h.value, ch.value,
                         depth.value).copy()

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
