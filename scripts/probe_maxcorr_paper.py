#!/usr/bin/env python
"""Project the paper-scale MaxCorrs wall time by timing the native
banded-bitset scan on sample seed chunks of the current MSAreal."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from repeatresolver_tpu.utils.hostmem import tune_allocator
from repeatresolver_tpu.utils import io as rio
from repeatresolver_tpu.utils import native
from repeatresolver_tpu import config as C

tune_allocator()
path = sys.argv[1]
threads = int(sys.argv[2]) if len(sys.argv) > 2 else 1
t0 = time.perf_counter()
msa = rio.read_msa(path)
r, c = msa.shape
print(f"read {r}x{c} in {time.perf_counter()-t0:.0f}s", flush=True)
cfg = C.MaxCorrConfig()
t0 = time.perf_counter()
bits = native.MaxCorrBitsets(msa)
print(f"bitsets in {time.perf_counter()-t0:.0f}s", flush=True)
chunk = 512
total = 0.0
for frac in (0.1, 0.3, 0.5, 0.7, 0.9):
    i0 = int(c * frac)
    mc = np.zeros(c * 5, np.float64)
    t0 = time.perf_counter()
    bits.scan(mc, i0, i0 + chunk, cfg.mincov, cfg.min_col_gap, r,
              cfg.majority_filter, True, threads)
    dt = time.perf_counter() - t0
    total += dt
    print(f"seed {i0}..{i0+chunk}: {dt:.1f}s "
          f"({chunk/dt:.0f} seed cols/s)", flush=True)
proj = total / (5 * chunk) * c
print(f"projected full scan at {threads} threads: {proj:.0f}s "
      f"({proj/3600:.2f}h)", flush=True)
