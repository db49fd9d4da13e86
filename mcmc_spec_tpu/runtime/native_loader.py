"""ctypes bindings for the native IO runtime (libfastascii.so).

Builds lazily with ``make`` on first use if the shared object is missing and a
compiler is available; falls back to ``None`` so pure-python paths keep
working (``SpectralGrid.from_btsettl_dir`` checks :func:`maybe_reader`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastascii.so")


class NativeReader:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.msq_read_two_columns.restype = ctypes.POINTER(ctypes.c_double)
        lib.msq_read_two_columns.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.msq_read_many.restype = None
        lib.msq_read_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        lib.msq_free.restype = None
        lib.msq_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        # single-column readers may be absent in a stale pre-built .so
        self._has_single = hasattr(lib, "msq_read_single_column")
        if self._has_single:
            lib.msq_read_single_column.restype = ctypes.POINTER(ctypes.c_double)
            lib.msq_read_single_column.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_long)]
            lib.msq_read_many_single.restype = None
            lib.msq_read_many_single.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_long), ctypes.c_int]

    def read_two_columns(self, path: str, lo: float, hi: float):
        n = ctypes.c_long(0)
        ptr = self._lib.msq_read_two_columns(path.encode(), lo, hi, ctypes.byref(n))
        if not ptr:
            raise IOError(f"native reader failed on {path}")
        try:
            buf = np.ctypeslib.as_array(ptr, shape=(2 * max(n.value, 1),))
            wl = np.array(buf[: n.value], dtype=np.float64)
            fx = np.array(buf[n.value : 2 * n.value], dtype=np.float64)
        finally:
            self._lib.msq_free(ptr)
        return wl, fx

    def read_single_column(self, path: str):
        if not self._has_single:
            raise IOError("stale libfastascii.so without single-column support")
        n = ctypes.c_long(0)
        ptr = self._lib.msq_read_single_column(path.encode(), ctypes.byref(n))
        if not ptr:
            raise IOError(f"native reader failed on {path}")
        try:
            buf = np.ctypeslib.as_array(ptr, shape=(max(n.value, 1),))
            return np.array(buf[: n.value], dtype=np.float64)
        finally:
            self._lib.msq_free(ptr)

    def read_many_single(self, paths, nthreads: int = 0):
        if not self._has_single:
            raise IOError("stale libfastascii.so without single-column support")
        nf = len(paths)
        c_paths = (ctypes.c_char_p * nf)(*[p.encode() for p in paths])
        results = (ctypes.POINTER(ctypes.c_double) * nf)()
        counts = (ctypes.c_long * nf)()
        self._lib.msq_read_many_single(c_paths, nf, results, counts, nthreads)
        out, failed = [], None
        try:
            for i in range(nf):
                ptr, n = results[i], counts[i]
                if not ptr:
                    failed = paths[i] if failed is None else failed
                    continue
                buf = np.ctypeslib.as_array(ptr, shape=(max(n, 1),))
                out.append(np.array(buf[:n], dtype=np.float64))
        finally:
            # free EVERY returned buffer, including ones past a failed slot
            for i in range(nf):
                if results[i]:
                    self._lib.msq_free(results[i])
        if failed is not None:
            raise IOError(f"native reader failed on {failed}")
        return out

    def read_many(self, paths, lo: float, hi: float, nthreads: int = 0):
        nf = len(paths)
        c_paths = (ctypes.c_char_p * nf)(*[p.encode() for p in paths])
        results = (ctypes.POINTER(ctypes.c_double) * nf)()
        counts = (ctypes.c_long * nf)()
        self._lib.msq_read_many(c_paths, nf, lo, hi, results, counts, nthreads)
        out, failed = [], None
        try:
            for i in range(nf):
                ptr, n = results[i], counts[i]
                if not ptr:
                    failed = paths[i] if failed is None else failed
                    continue
                buf = np.ctypeslib.as_array(ptr, shape=(2 * max(n, 1),))
                out.append(
                    (np.array(buf[:n], dtype=np.float64), np.array(buf[n : 2 * n], dtype=np.float64))
                )
        finally:
            for i in range(nf):
                if results[i]:
                    self._lib.msq_free(results[i])
        if failed is not None:
            raise IOError(f"native reader failed on {failed}")
        return out


_READER: Optional[NativeReader] = None
_TRIED = False


def maybe_reader() -> Optional[NativeReader]:
    """The native reader, building it on first use; ``None`` if unavailable."""
    global _READER, _TRIED
    if _READER is not None or _TRIED:
        return _READER
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        _READER = NativeReader(ctypes.CDLL(_SO_PATH))
    except OSError:
        return None
    return _READER
