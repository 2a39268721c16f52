#!/usr/bin/env python
"""Benchmark: banded realignment DP cell-update rate per chip.

Prints ONE JSON line:
  {"metric": "dp_cell_updates_per_s", "value": N, "unit": "cells/s",
   "vs_baseline": N / BASELINE}

BASELINE = 8.33e7 cells/s: the reference PW_ReAligner (single-thread C,
gcc -O2) measured on this host (60x3000 synthetic MSA, band 1000,
5 rounds in 9.6 s; cells = sum(row lengths) x band x rounds). The
reference's own qualitative number — "run over a weekend" for the paper
dataset (~4e11 cells/round, README.md:71) — is consistent with this
rate (~80 min/round, ~35 rounds).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_S = 8.33e7


def main():
    import jax
    from repeatresolver_tpu.ops.banded_realign import banded_fill

    # Flagship shape: block of rows against a realistic window.
    b, l, w, c = 64, 4096, 512, 8192
    rng = np.random.default_rng(0)
    msa = rng.integers(0, 4, (b, c)).astype(np.int8)
    counts = np.zeros((c, 6), np.int32)
    for s in range(6):
        counts[:, s] = (msa == s).sum(axis=0)
    counts[:, 0] += 40  # pretend other rows exist
    seqs = rng.integers(0, 4, (b, l)).astype(np.int8)
    # plausible monotone band centers
    ways = np.linspace(0, c - 1, l).astype(np.int32)
    ways = np.broadcast_to(ways, (b, l)).copy()
    lengths = np.full(b, l, np.int32)

    def run():
        out = banded_fill(counts, msa, seqs, ways, lengths,
                          np.int32(c), bandwidth=w)
        # Force completion with a tiny dependent readback:
        # block_until_ready does not reliably block on the axon
        # platform, and a full-output transfer would measure the
        # network tunnel instead of the chip.
        return int(np.asarray(out[1][0, 0]))

    run()  # compile + settle
    iters = 3
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    cells = b * l * w
    rate = cells / dt
    print(json.dumps({
        "metric": "dp_cell_updates_per_s",
        "value": round(rate),
        "unit": "cells/s",
        "vs_baseline": round(rate / BASELINE_CELLS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
