"""ctypes bindings for the native C++ image loader (native/dataloader.cc).

The native library does JPEG/PNG decode + shortest-side bilinear resize +
center crop + [-1,1] float32 NHWC normalize with a multithreaded prefetch
ring, keeping the TPU fed without Python in the image path. Falls back to
the PIL path (pipeline/preprocess.py) when the library isn't built.

Build: ``make -C native`` (g++, libjpeg, libpng).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libselftok_data.so"),
    "libselftok_data.so",
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.stk_preprocess_file.restype = ctypes.c_int
        lib.stk_preprocess_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.stk_preprocess_bytes.restype = ctypes.c_int
        lib.stk_preprocess_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.stk_loader_create.restype = ctypes.c_void_p
        lib.stk_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.stk_loader_next.restype = ctypes.c_int
        lib.stk_loader_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_long)]
        lib.stk_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.stk_loader_stats.restype = ctypes.c_long
        lib.stk_loader_stats.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_long)]
        _LIB = lib
        return lib
    return None


def native_available():
    return _load() is not None


def preprocess_file(path, size):
    """file -> [1, size, size, 3] float32 in [-1,1] via the native path;
    falls back to PIL."""
    lib = _load()
    if lib is None:
        from selftoktokenizer_tpu.pipeline.preprocess import load_image

        return load_image(path, size)
    out = np.empty((size, size, 3), np.float32)
    ok = lib.stk_preprocess_file(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if not ok:
        raise IOError(f"native decode failed: {path}")
    return out[None]


class NativeImageLoader:
    """Prefetching batch iterator over image paths.

    yields float32 [batch, size, size, 3] arrays (short batches possible at
    the tail; failed decodes are dropped and counted in .stats()).

    Batches complete in WORKER order, not path order — use
    ``next_with_indices()`` (or ``.last_indices`` after ``__next__``) for any
    token <-> path association.
    """

    def __init__(self, paths, size=256, batch=16, n_threads=4, queue_cap=4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native loader not built — run `make -C native`")
        self._lib = lib
        self.size, self.batch = size, batch
        self._cpaths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = lib.stk_loader_create(self._cpaths, len(paths), size, batch,
                                        n_threads, queue_cap)
        self._buf = np.empty((batch, size, size, 3), np.float32)
        self._idx = np.empty((batch,), np.int64)
        self.last_indices = None

    def __iter__(self):
        return self

    def __next__(self):
        imgs, idx = self.next_with_indices()
        return imgs

    def next_with_indices(self):
        """-> (images [n,size,size,3], source path indices [n]). Raises
        StopIteration when exhausted."""
        n = self._lib.stk_loader_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        if n < 0:
            raise StopIteration
        self.last_indices = self._idx[:n].copy()
        return self._buf[:n].copy(), self.last_indices

    def stats(self):
        failed = ctypes.c_long(0)
        decoded = self._lib.stk_loader_stats(self._h, ctypes.byref(failed))
        return {"decoded": int(decoded), "failed": int(failed.value)}

    def close(self):
        if self._h:
            self._lib.stk_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
