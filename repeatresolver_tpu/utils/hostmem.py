"""Host allocator tuning for VMs with slow anonymous-page provisioning.

Root cause, measured on this box (firecracker microVM, THP
enabled=madvise defrag=madvise): numpy madvises MADV_HUGEPAGE on every
allocation >=4 MB, and with defrag=madvise each hugepage fault performs
SYNCHRONOUS memory compaction — first-touch fills run at ~0.01 GB/s
(/proc/vmstat compact_free_scanned grows by millions per allocation).
With the madvise disabled the same cold fill runs at ~1-2 GB/s and
warm buffers copy at ~10 GB/s. At paper scale (2.5 GB MSA) this was
the difference between a multi-hour realignment sweep and a
DP-kernel-bound one of a few minutes.

Two further mitigations stay on: raising M_MMAP_THRESHOLD /
M_TRIM_THRESHOLD keeps <=1 GB buffers on the reusable (warm) heap, and
callers reuse big buffers where practical (arrays >1 GB exceed the
mallopt int range and always round-trip through fresh mmaps).

The reference sidesteps this class of problem by allocating linked-list
nodes incrementally (PW_ReAligner.c malloc-per-column); a dense-array
engine must manage its big-buffer lifecycle instead — this is that
subsystem.
"""
from __future__ import annotations

import ctypes
import sys

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1

_done = False


def _disable_numpy_hugepage_madvise() -> None:
    # runtime equivalent of NUMPY_MADVISE_HUGEPAGE=0 (which only works
    # if set before numpy import)
    try:
        from numpy._core import multiarray as _ma
    except ImportError:     # numpy < 2
        from numpy.core import multiarray as _ma  # type: ignore
    _ma._set_madvise_hugepage(False)


def tune_allocator() -> bool:
    """Idempotent; safe no-op off Linux/glibc. Returns True if the
    allocator is (now) tuned."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        _disable_numpy_hugepage_madvise()
    except Exception:
        pass
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _done = bool(ok1 and ok2)
    except Exception:
        return False
    return _done
