"""ctypes bindings for the native whitespace-table parser (native/fast_txt.cpp).

The reference reads ShapeNet .txt clouds with numpy.loadtxt
(/root/reference/hpcs/data/shapenet.py:99), which dominates first-epoch wall
time.  This wrapper loads the C++ parser (~30-60x faster), building it with
g++ on first use if the shared library is missing, and falls back to
numpy.loadtxt when no toolchain is available.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

# repo checkout layout by default; HPCS_TPU_NATIVE_SRC overrides for
# pip-installed environments that keep the C++ source elsewhere (without it
# they silently use the numpy fallback, see pyproject.toml)
_NATIVE_DIR = os.environ.get(
    "HPCS_TPU_NATIVE_SRC",
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "fast_txt.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libfast_txt.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    # compile to a unique temp path then atomically rename: two processes
    # sharing the repo (multi-host launch) must never observe a half-written
    # .so, whose fresh mtime would suppress rebuilds forever
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    """Load (building if needed) the shared library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                _build()
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                # corrupt .so from a crashed build: delete + rebuild once so
                # a fresh mtime doesn't pin all future runs to numpy.loadtxt
                os.unlink(_SO)
                _build()
                lib = ctypes.CDLL(_SO)
            lib.parse_float_table.restype = ctypes.c_long
            lib.parse_float_table.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_long,
            ]
            lib.count_rows.restype = ctypes.c_long
            lib.count_rows.argtypes = [ctypes.c_char_p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib = None
        return _lib


def available():
    """True when the native parser is loadable (g++ present or .so built)."""
    return _load() is not None


def loadtxt(path, n_cols=7):
    """Parse a whitespace-separated float table -> float32 [rows, n_cols].

    Matches numpy.loadtxt on well-formed tables (blank lines skipped,
    trailing newline tolerated).  Raises FileNotFoundError on a missing file.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    lib = _load()
    if lib is None:
        return np.loadtxt(path).astype(np.float32).reshape(-1, n_cols)
    bpath = os.fspath(path).encode()
    max_rows = lib.count_rows(bpath)
    if max_rows < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((max_rows, n_cols), dtype=np.float32)
    got = lib.parse_float_table(
        bpath, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, n_cols,
    )
    if got < 0:
        raise IOError(f"cannot read {path}")
    return out[:got]
