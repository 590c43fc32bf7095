"""ctypes bindings for the native fast file parser.

Builds ``native/fastparse.c`` on first use (g++/cc, cached next to the
source) and exposes ``load_numbers(path)``. The pure-Python fallback is
used when no compiler is available, so the package stays dependency
free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    src = os.path.join(src_dir, "fastparse.c")
    lib_path = os.path.join(src_dir, "libfastparse.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            for cc in ("cc", "gcc", "g++"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", src, "-o",
                         lib_path], check=True, capture_output=True)
                    break
                except (subprocess.CalledProcessError, FileNotFoundError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(lib_path)
        lib.fastparse_doubles.restype = ctypes.c_long
        lib.fastparse_doubles.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long]
        lib.fastparse_count.restype = ctypes.c_long
        lib.fastparse_count.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def load_numbers(path: str) -> np.ndarray:
    """All whitespace-separated numbers in the file ('#' comments
    skipped), as float64. Uses the native parser when available."""
    lib = _build_lib()
    if lib is not None:
        n = lib.fastparse_count(path.encode())
        if n >= 0:
            out = np.empty(n, dtype=np.float64)
            got = lib.fastparse_doubles(path.encode(), out, n)
            if got == n:
                return out
    # fallback: numpy/python
    toks = []
    with open(path) as f:
        for line in f:
            s = line.split("#")[0].split()
            for t in s:
                try:
                    toks.append(float(t))
                except ValueError:
                    pass
    return np.array(toks, dtype=np.float64)
