"""ctypes binding for the native loading core (csrc/euler_core.cc).

The reference's graph engine is C++ end-to-end; here the *device* work is
XLA and only the host loading path (CSR build, alias tables — the
graph_builder.cc:57-157 role) is native. The binding compiles the shared
library on first use (g++ is baked into the image) and transparently falls
back to the numpy implementations if compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "euler_core.cc")
_SO = os.path.join(_HERE, "libeuler_core.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (compiling if needed) the native core; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        stale = (os.path.exists(_SO) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO))
        if (not os.path.exists(_SO) or stale) and not _compile() \
                and not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, i32, f32 = (np.ctypeslib.ndpointer(dt, flags="C_CONTIGUOUS")
                         for dt in (np.int64, np.int32, np.float32))
        lib.etpu_build_csr.restype = ctypes.c_int
        lib.etpu_build_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32, i32, i32, f32, i64, i64, i32, f32, f32, f32]
        lib.etpu_build_alias.restype = ctypes.c_int
        lib.etpu_build_alias.argtypes = [ctypes.c_int64, f32, f32, i32]
        try:
            lib.etpu_build_group_alias.restype = ctypes.c_int
            lib.etpu_build_group_alias.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64, f32, f32, i32]
        except AttributeError:  # stale .so missing the symbol
            pass
        try:
            lib.etpu_parse_edge_list.restype = ctypes.c_int64
            lib.etpu_parse_edge_list.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, i32, i32, f32,
                ctypes.c_int64]
        except AttributeError:
            pass
        _lib = lib
        return _lib


def build_csr_native(n, n_et, src, dst, etype, ew, eid=None):
    """Native equivalent of convert.build_csr; returns the same tuple or
    None when the library is unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return None
    m = len(src)
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    etype = np.ascontiguousarray(etype, np.int32)
    ew = np.ascontiguousarray(ew, np.float32)
    group_ptr = np.empty(n * n_et + 1, np.int64)
    perm = np.empty(m, np.int64)
    col = np.empty(m, np.int32)
    w_sorted = np.empty(m, np.float32)
    w_cumsum = np.empty(m, np.float32)
    gws = np.empty(n * n_et, np.float32)
    rc = lib.etpu_build_csr(n, n_et, m, src, dst, etype, ew,
                            group_ptr, perm, col, w_sorted, w_cumsum, gws)
    if rc != 0:
        return None
    if eid is None:
        eid = np.arange(m, dtype=np.int32)
    gp = group_ptr.astype(np.int32) if group_ptr[-1] <= 2**31 - 1 \
        else group_ptr
    return (gp, col, w_sorted, w_cumsum,
            np.asarray(eid)[perm].astype(np.int32), perm)


def build_alias_native(weights):
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(weights, np.float32)
    n = len(w)
    prob = np.empty(n, np.float32)
    alias = np.empty(n, np.int32)
    if lib.etpu_build_alias(n, w, prob, alias) != 0:
        return None
    return prob, alias


def build_group_alias_native(group_ptr, weights):
    """Per-CSR-group alias tables (see etpu_build_group_alias); None when
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_build_group_alias"):
        return None
    gp = np.ascontiguousarray(group_ptr, np.int64)
    w = np.ascontiguousarray(weights, np.float32)
    m = len(w)
    prob = np.empty(m, np.float32)
    alias = np.empty(m, np.int32)
    if lib.etpu_build_group_alias(len(gp) - 1, m, gp, w, prob, alias) != 0:
        return None
    return prob, alias


def parse_edge_list_native(buf: bytes):
    """Parse "src<sep>dst[<sep>w]" text (bytes) -> (src, dst, w) int32/
    int32/f32 arrays in file order, or None without the native core.
    Skips '#' comments and malformed lines — same contract as the
    Python loop in graph.stream_convert.convert_edge_list."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_parse_edge_list"):
        return None
    cap = buf.count(b"\n") + 1
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    w = np.empty(cap, np.float32)
    n = lib.etpu_parse_edge_list(buf, len(buf), src, dst, w, cap)
    if n < 0:
        return None
    return src[:n], dst[:n], w[:n]
