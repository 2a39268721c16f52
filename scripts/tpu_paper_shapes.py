#!/usr/bin/env python
"""Measure the production TPU realign path at paper shapes on real silicon.

VERDICT r1 items 1+3 evidence: takes a row slice of the ACTUAL
paper-run MSA (Tree d=1% l=30000 n=100 c=40, runs/paper), builds the
production `BatchedRealigner` exactly as `realign_batched` would on the
TPU backend (mode=staircase, kernel=pallas, band 1000, block_rows 64 —
models/realigner.py:800-811), and times full production sweeps
(fill + entry/backtrack + block apply) on the device. Reports cells/s
alongside the XLA-staircase kernel on the same slice for comparison.

Usage (real chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_paper_shapes.py \
        [--msa runs/paper/Tree_1perc_30000kb_MSAreal] [--rows 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def read_msa_rows(path, nrows):
    """First nrows of a fixed-width MSA file without loading the rest."""
    from repeatresolver_tpu.utils.io import SYM2CODE
    with open(path, "rb") as f:
        head = f.read(1 << 22)
        width = head.index(b"\n")
        stride = width + 1
        f.seek(0)
        buf = np.frombuffer(f.read(nrows * stride), np.uint8)
    nrows = min(nrows, buf.size // stride)
    view = buf[:nrows * stride].reshape(nrows, stride)[:, :width]
    assert (view[:, -1] != 10).all()
    msa = SYM2CODE[view]
    assert (msa >= 0).all()
    return msa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--msa",
                    default="runs/paper/Tree_1perc_30000kb_MSAreal")
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--band", type=int, default=1000)
    ap.add_argument("--block-rows", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=2)
    ap.add_argument("--kernel", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--chunk", type=int, default=0,
                    help="staircase chunk T (0 = production default)")
    args = ap.parse_args()

    from repeatresolver_tpu.utils.hostmem import tune_allocator
    tune_allocator()
    import jax
    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)

    t0 = time.perf_counter()
    msa = read_msa_rows(args.msa, args.rows)
    # drop all-gap columns outside this slice's span so the slice is a
    # self-consistent MSA (production blocks see compacted spans too)
    used = (msa < 4).any(axis=0)
    msa = msa[:, used.argmax():len(used) - used[::-1].argmax()]
    chars = int((msa < 4).sum())
    print(f"slice: {msa.shape[0]} rows x {msa.shape[1]} cols, "
          f"{chars} chars ({time.perf_counter() - t0:.1f}s)", flush=True)

    from repeatresolver_tpu.models.realigner import BatchedRealigner
    kw = {"chunk": args.chunk} if args.chunk else {}
    eng = BatchedRealigner(msa, bandwidth=args.band,
                           block_rows=args.block_rows,
                           mode="staircase", kernel=args.kernel, **kw)
    eng.ent_al_gapper()
    rates = []
    for s in range(args.sweeps):
        t0 = time.perf_counter()
        eng.sweep()
        dt = time.perf_counter() - t0
        cells = int((eng.msa < 4).sum()) * args.band
        rates.append(cells / dt)
        print(f"sweep {s}: {dt:.1f}s  {cells / dt:.3e} cells/s  "
              f"score={eng.overall_pair()}", flush=True)
    out = {"metric": "paper_shape_sweep_cells_per_s",
           "value": round(max(rates)),
           "backend": backend, "kernel": args.kernel,
           "rows": int(msa.shape[0]), "cols": int(msa.shape[1]),
           "band": args.band, "block_rows": args.block_rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
