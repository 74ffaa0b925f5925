"""ctypes bindings for the native runtime (C++), with on-demand build.

The reference implements its IO and sorting layers in C++ (src/kseq.h,
src/lv2_cpu_sort.h); this package provides the equivalent native fast paths
for this framework's host runtime: fastx parsing/packing and the multiword
radix argsort used by the graph builder. Falls back to pure numpy/Python
when the toolchain or zlib is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_megagta_native.so")
_SOURCES = ["fastx_parser.cpp", "radix_sort.cpp"]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        *[os.path.join(_DIR, s) for s in _SOURCES],
        "-o", _LIB_PATH, "-lz",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """The loaded native library, building it on first use; None if
    unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        newest_src = max(
            os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES
        )
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.fastx_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fastx_parse.restype = ctypes.c_int
        lib.fastx_fetch.argtypes = [
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.fastx_fetch.restype = ctypes.c_int
        lib.radix_argsort_u64.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.radix_argsort_u64.restype = ctypes.c_int
        _lib = lib
        return _lib


def parse_fastx_native(path: str):
    """(flat_codes, starts) via the native parser, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nr = ctypes.c_int64()
    nb = ctypes.c_int64()
    rc = lib.fastx_parse(path.encode(), ctypes.byref(nr), ctypes.byref(nb))
    if rc != 0:
        return None
    codes = np.empty(nb.value, np.int8)
    starts = np.empty(nr.value + 1, np.int64)
    if lib.fastx_fetch(codes, starts) != 0:
        return None
    return codes, starts


def radix_argsort(keys: np.ndarray, n_threads: int | None = None):
    """Lexicographic argsort of [N, W] uint64 rows; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.uint64)
    n, w = keys.shape
    perm = np.empty(n, np.uint32)
    threads = n_threads or min(16, os.cpu_count() or 1)
    if lib.radix_argsort_u64(keys, n, w, perm, threads) != 0:
        return None
    return perm.astype(np.int64)
