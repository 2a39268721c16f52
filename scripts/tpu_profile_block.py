#!/usr/bin/env python
"""Break down one production realign block at paper shapes on the chip:
host framing / Pallas staircase fill / entry+backtrack / block apply.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_profile_block.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from scripts.tpu_paper_shapes import read_msa_rows


def main():
    from repeatresolver_tpu.utils.hostmem import tune_allocator
    tune_allocator()
    import jax
    print(f"backend={jax.default_backend()}", flush=True)

    path = (sys.argv[1] if len(sys.argv) > 1
            else "runs/paper/Tree_1perc_30000kb_MSAreal")
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    msa = read_msa_rows(path, rows)
    used = (msa < 4).any(axis=0)
    msa = msa[:, used.argmax():len(used) - used[::-1].argmax()]
    from repeatresolver_tpu.models.realigner import BatchedRealigner
    eng = BatchedRealigner(msa, bandwidth=1000, block_rows=64,
                           mode="staircase", kernel="pallas")
    eng.ent_al_gapper()

    from repeatresolver_tpu.ops import banded_realign as br
    from repeatresolver_tpu.ops import pallas_realign as pr
    from repeatresolver_tpu.ops import staircase_realign as sr

    # instrument by monkeypatching the two device entry points
    acc = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            # tiny dependent readback (device-side index, scalar
            # transfer) — block_until_ready hangs on the tunneled
            # device (see bench.py measurement notes)
            for leaf in jax.tree.leaves(out):
                if hasattr(leaf, "ndim"):
                    np.asarray(leaf[(0,) * leaf.ndim])
                    break
            acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrap

    pr_fill = pr.staircase_fill_pallas
    br_bt = br.entry_and_backtrack
    pr.staircase_fill_pallas = timed("pallas_fill", pr_fill)
    br.entry_and_backtrack = timed("entry_backtrack", br_bt)
    apply0 = eng._apply_block

    def timed_apply(*a, **k):
        t0 = time.perf_counter()
        out = apply0(*a, **k)
        acc["apply"] = acc.get("apply", 0.0) + time.perf_counter() - t0
        return out
    eng._apply_block = timed_apply

    for s in range(2):
        acc.clear()
        t0 = time.perf_counter()
        eng.sweep()
        total = time.perf_counter() - t0
        cells = int((eng.msa < 4).sum()) * 1000
        other = total - sum(acc.values())
        print(f"sweep {s}: total {total:.1f}s  {cells/total:.3e} c/s  "
              + "  ".join(f"{k}={v:.1f}s" for k, v in acc.items())
              + f"  host_other={other:.1f}s", flush=True)


if __name__ == "__main__":
    main()
