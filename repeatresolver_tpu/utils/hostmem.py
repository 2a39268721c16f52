"""Host allocator tuning for VMs with slow anonymous-page provisioning.

Measured on this box (firecracker microVM): a FRESH 256 MB numpy
allocation faults its pages in at ~6 MB/s, while a reused (already
touched) buffer copies at ~10 GB/s — first-touch page provisioning is
~1500x slower than memcpy. glibc by default serves >128 KB allocations
with mmap and munmaps them on free, so every realignment block that
splices the multi-GB MSA into a new array pays the full first-touch
cost again; profiled at paper scale this made one sweep hours long
while the DP kernel itself needed ~3 minutes. Raising M_MMAP_THRESHOLD
and M_TRIM_THRESHOLD keeps big buffers on the reusable heap: the first
allocation still faults once, every later one recycles warm pages.

The reference sidesteps this class of problem by allocating linked-list
nodes incrementally (PW_ReAligner.c malloc-per-column); a dense-array
engine must manage its big-buffer lifecycle instead — this is that
subsystem, one mallopt pair deep.
"""
from __future__ import annotations

import ctypes
import sys

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1

_done = False


def tune_allocator() -> bool:
    """Idempotent; safe no-op off Linux/glibc. Returns True if the
    allocator is (now) tuned."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _done = bool(ok1 and ok2)
    except Exception:
        return False
    return _done
