"""ctypes loader for the native host ops (native/host_ops.cpp).

Compiles on first use if the shared library is missing (g++ is part of
the image); every entry point has a pure-Python fallback at its call
site, so a failed build degrades to slow-but-correct.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libhostops.so")
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) <
                os.path.getmtime(os.path.join(_REPO, "native",
                                              "host_ops.cpp"))):
            subprocess.run(
                ["bash", os.path.join(_REPO, "native", "build.sh")],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        lib.kmeans_top5_centroids.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, ctypes.c_void_p]
        lib.kmeans_assign_dissolve.argtypes = [
            ctypes.c_void_p, i64, i64, ctypes.c_void_p, ctypes.c_void_p]
        lib.editdp_backtrack.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            i64, i64, i64, ctypes.c_void_p]
        lib.realign_block_native.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, i64]
        lib.realign_backtrack.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64,
            ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, i64]
        lib.realign_backtrack.restype = i64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def kmeans_top5_centroids(scores: np.ndarray,
                          varsigs: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = scores.shape[0]
    v = varsigs.shape[1]
    scores = np.ascontiguousarray(scores, np.int64)
    vs = np.ascontiguousarray(varsigs, np.uint8)
    cent = np.zeros((n, v), np.uint8)
    lib.kmeans_top5_centroids(_ptr(scores), _ptr(vs), n, v, _ptr(cent))
    return cent


def kmeans_assign_dissolve(cent_scores: np.ndarray,
                           mingroup: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = cent_scores.shape[0]
    cs = np.ascontiguousarray(cent_scores, np.int64)
    out = np.zeros(n, np.int32)
    size = np.zeros(n, np.int64)
    lib.kmeans_assign_dissolve(_ptr(cs), n, mingroup, _ptr(out),
                               _ptr(size))
    return out


def editdp_backtrack(codes: np.ndarray, qlens: np.ndarray,
                     entries: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    b, lq, lt = codes.shape
    codes = np.ascontiguousarray(codes, np.int8)
    ql = np.ascontiguousarray(qlens, np.int32)
    en = np.ascontiguousarray(entries, np.int64)
    out = np.zeros((b, lq), np.int32)
    lib.editdp_backtrack(_ptr(codes), _ptr(ql), _ptr(en), b, lq, lt,
                         _ptr(out))
    return out


def realign_block(counts, rows_old, seqs, ways, lengths, bandwidth,
                  ins_cap=512):
    """Fused native banded fill + backtrack for a block. Returns
    (new_rows int8 [B, C] with 5 default, best int64 [B],
    ins_y [B, K], ins_base [B, K], ins_n [B]) or None if the native
    lib is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "realign_block_native"):
        return None
    counts = np.ascontiguousarray(counts, np.int32)
    rows_old = np.ascontiguousarray(rows_old, np.int8)
    seqs = np.ascontiguousarray(seqs, np.int8)
    ways = np.ascontiguousarray(ways, np.int32)
    lengths = np.ascontiguousarray(lengths, np.int32)
    b, c = rows_old.shape
    l = seqs.shape[1]
    new_rows = np.full((b, c), 5, np.int8)
    best = np.zeros(b, np.int64)
    iy = np.zeros((b, ins_cap), np.int32)
    ib = np.zeros((b, ins_cap), np.int8)
    inn = np.zeros(b, np.int32)
    lib.realign_block_native(_ptr(counts), _ptr(rows_old), _ptr(seqs),
                             _ptr(ways), _ptr(lengths), b, c, l,
                             bandwidth, _ptr(new_rows), _ptr(best),
                             _ptr(iy), _ptr(ib), _ptr(inn), ins_cap)
    return new_rows, best, iy, ib, inn
