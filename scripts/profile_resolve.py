#!/usr/bin/env python
"""cProfile one paper-scale window resolve (read-only inputs).

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python scripts/profile_resolve.py [von bis]
"""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from repeatresolver_tpu.utils.hostmem import tune_allocator
    tune_allocator()
    from repeatresolver_tpu import config as C
    from repeatresolver_tpu.models import resolver
    from repeatresolver_tpu.utils import io as rio

    von = int(sys.argv[1]) if len(sys.argv) > 1 else 11700
    bis = int(sys.argv[2]) if len(sys.argv) > 2 else 29500
    wd = "runs/paper"
    name = "Tree_1perc_30000kb_MSAreal"
    t0 = time.perf_counter()
    msa = rio.read_msa(os.path.join(wd, name))
    mc = rio.read_maxcorrs(os.path.join(wd, "MaxCorrsOf_" + name))
    print(f"loaded {msa.shape} in {time.perf_counter() - t0:.0f}s",
          flush=True)
    keep = (msa[:, von] < 5) & (msa[:, bis] < 5)
    cov = max(4, int(keep.sum()) // 100)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    out = resolver.resolve_window(msa, mc, von, bis,
                                  C.ResolverConfig(cov=cov))
    prof.disable()
    print(f"resolve: {time.perf_counter() - t0:.0f}s  kmeans "
          f"clusters={int(out['Kmeans'].max()) + 1}", flush=True)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(30)
    st.sort_stats("tottime").print_stats(30)


if __name__ == "__main__":
    main()
