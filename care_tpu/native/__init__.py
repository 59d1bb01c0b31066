"""ctypes binding for the native evaluation core (libcare_eval.so).

Builds lazily via ``make`` on first import if a toolchain is present;
falls back to pure python when unavailable. See ``eval_core.cc``.
"""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libcare_eval.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "eval_core.cc")
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if stale:
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        except Exception:
            # never load a stale lib: its ABI may not match the bindings
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lcs_len.restype = ctypes.c_int32
        lib.lcs_len.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int32,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int32]
        lib.meteor_align.restype = ctypes.c_int32
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _as_i32(seq):
    import numpy as np
    arr = np.ascontiguousarray(seq, dtype=np.int32)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def lcs_len(a, b):
    """Native LCS over two int sequences; None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    aa, pa = _as_i32(a)
    bb, pb = _as_i32(b)
    return int(lib.lcs_len(pa, len(aa), pb, len(bb)))


def meteor_align(hyp_exact, hyp_stem, ref_exact, ref_stem):
    """Native METEOR-1.5 beam-search alignment; returns [(h, r, module)]
    or None. Semantics match ``care_tpu/metrics/meteor.py:_align`` (joint
    beam resolution: max matches, then min chunks, then min distance;
    exact + stem modules). Returns None for refs > 64 tokens (bitmask
    width) — callers fall back to the python aligner."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    he, phe = _as_i32(hyp_exact)
    hs, phs = _as_i32(hyp_stem)
    re_, pre = _as_i32(ref_exact)
    rs, prs = _as_i32(ref_stem)
    n_hyp, n_ref = len(he), len(re_)
    out = np.zeros(3 * max(n_hyp, 1), dtype=np.int32)
    m = lib.meteor_align(
        phe, phs, n_hyp, pre, prs, n_ref,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if m < 0:
        return None
    return [(int(out[3 * k]), int(out[3 * k + 1]), int(out[3 * k + 2]))
            for k in range(m)]
