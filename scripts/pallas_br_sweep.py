#!/usr/bin/env python
"""On-chip sweep of the Pallas kernel's rows-per-program (BR) knob.

The staircase fill's step loop is a serial dependency chain whose
depth does not grow with BR, and the grid runs sequentially on the
single TensorCore — so BR controls how many independent vregs each
chain stage keeps in flight. This sweeps BR x chunk at bench shapes
in subprocesses (RR_PALLAS_BR is read at import) and prints cells/s.

Usage: python scripts/pallas_br_sweep.py [--b 64] [--l 2048]
           [--w 512] [--c 4096]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import time, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from repeatresolver_tpu.ops import pallas_realign as pr

b, l, w, c, t, widen = {b}, {l}, {w}, {c}, {t}, {widen}
rng = np.random.default_rng(0)
msa = rng.integers(0, 4, (b, c)).astype(np.int8)
counts = np.zeros((c, 6), np.int32)
for s in range(6):
    counts[:, s] = (msa == s).sum(axis=0)
counts[:, 0] += 40
seqs = rng.integers(0, 4, (b, l)).astype(np.int8)
ways = np.broadcast_to(np.linspace(0, c - 1, l).astype(np.int32),
                       (b, l)).copy()
lengths = np.full(b, l, np.int32)
args = tuple(jax.device_put(jnp.asarray(x))
             for x in (counts, msa, seqs, ways, lengths))

def run():
    out = pr.staircase_fill_pallas(*args, np.int32(c), bandwidth=w,
                                   chunk=t, widen=widen,
                                   time_major=True, packed=True)
    return int(np.asarray(out[1][0, 0]))

run(); run()
ts = []
for _ in range(5):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
print("RESULT", pr.BR, t, min(ts), b * l * w / min(ts))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--l", type=int, default=2048)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--c", type=int, default=4096)
    ap.add_argument("--brs", default="8,16,32,64")
    ap.add_argument("--chunks", default="128")
    ap.add_argument("--widen", type=int, default=1,
                    help="staircase slack rungs (production paper "
                         "dispatches run ~6)")
    args = ap.parse_args()

    results = []
    for br in [int(x) for x in args.brs.split(",")]:
        if args.b % br:
            continue
        for t in [int(x) for x in args.chunks.split(",")]:
            env = dict(os.environ)
            env["RR_PALLAS_BR"] = str(br)
            code = SNIPPET.format(repo=REPO, b=args.b, l=args.l,
                                  w=args.w, c=args.c, t=t,
                                  widen=args.widen)
            res = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True,
                                 timeout=560)
            line = [ln for ln in res.stdout.splitlines()
                    if ln.startswith("RESULT")]
            if not line:
                print(f"BR={br} t={t}: FAILED\n{res.stderr[-1500:]}",
                      file=sys.stderr)
                continue
            _, brv, tv, wall, rate = line[0].split()
            print(f"BR={brv} chunk={tv}: {float(wall)*1e3:.1f} ms  "
                  f"{float(rate):.3e} cells/s", flush=True)
            results.append({"br": int(brv), "chunk": int(tv),
                            "wall_s": float(wall),
                            "cells_per_s": float(rate)})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
