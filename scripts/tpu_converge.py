#!/usr/bin/env python
"""Converge a full realignment through the production Pallas TPU path
on the real chip, and assert trajectory parity against the CPU
staircase-XLA run of the same configuration.

This is the reference's headline loop (PW_ReAligner.c:1681-1747) done
end-to-end on the TPU: a real simulated dataset is cut and aligned on
host, then the MSA is realigned to convergence twice —

  * once on the session's real tunneled chip with the production
    BatchedRealigner configuration (mode=staircase, kernel=pallas,
    block-Jacobi + anneal),
  * once on the CPU backend with the XLA staircase kernel, same
    block_rows/band/anneal,

and the (mille, uno) score trajectories plus the final MSAreal files
must be BIT-EQUAL. Each leg runs in its own subprocess because the
axon plugin pins the backend at import (CLAUDE.md).

Artifacts land in --workdir (default runs/tpu_converge): scorelog_tpu,
scorelog_cpu, the two MSAreal files, and summary.json with wall times
and cells/s. Usage:

    PYTHONPATH=/root/repo python scripts/tpu_converge.py \
        [--workdir runs/tpu_converge] [-l 4000] [-n 8] [-c 25]
        [--band 1000] [--block-rows 64]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REALIGN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax
if {force_cpu!r} == "yes":
    jax.config.update("jax_platforms", "cpu")
from repeatresolver_tpu import config as C
from repeatresolver_tpu.utils import io as rio
from repeatresolver_tpu.models import realigner

msa = rio.read_msa({msa_path!r})
backend = jax.default_backend()
log = []
stats = {{}}
t0 = time.perf_counter()
out = realigner.realign_batched(
    msa, C.RealignerConfig(bandwidth={band}, block_rows={block_rows}),
    score_log=log, stats=stats, mode="staircase", kernel={kernel!r},
    score_log_path={scorelog!r})
wall = time.perf_counter() - t0
rio.write_msa({out_path!r}, out)
with open({meta_path!r}, "w") as f:
    json.dump({{"backend": backend, "wall_s": round(wall, 2),
               "rounds": stats.get("rounds"),
               "dp_cells": stats.get("dp_cells"),
               "cells_per_s": stats.get("cells_per_s"),
               "best": min(log), "trajectory_len": len(log)}}, f)
print("backend", backend, "wall", round(wall, 1), "s, rounds",
      stats.get("rounds"), "cells/s", stats.get("cells_per_s"))
"""


def run_leg(workdir, msa_path, tag, kernel, force_cpu, band, block_rows):
    code = REALIGN_SNIPPET.format(
        repo=REPO, force_cpu="yes" if force_cpu else "no",
        msa_path=msa_path, band=band, block_rows=block_rows,
        kernel=kernel,
        scorelog=os.path.join(workdir, f"scorelog_{tag}"),
        out_path=os.path.join(workdir, f"MSAreal_{tag}"),
        meta_path=os.path.join(workdir, f"meta_{tag}.json"))
    env = dict(os.environ)
    if force_cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
    t0 = time.perf_counter()
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    print(res.stdout.strip())
    if res.returncode != 0:
        print(res.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"{tag} leg failed")
    with open(os.path.join(workdir, f"meta_{tag}.json")) as f:
        meta = json.load(f)
    meta["subprocess_wall_s"] = round(time.perf_counter() - t0, 2)
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/tpu_converge")
    ap.add_argument("-c", type=int, default=25)
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("-d", type=float, default=1.0)
    ap.add_argument("-l", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--band", type=int, default=1000)
    ap.add_argument("--block-rows", type=int, default=64)
    ap.add_argument("--align-band", type=int, default=3000)
    ap.add_argument("--skip-cpu", action="store_true",
                    help="only run the TPU leg (no parity assert)")
    args = ap.parse_args()

    # The orchestrator only preps the dataset (simulate/cut/align) and
    # reads files; force it onto the CPU backend so the initial-aligner
    # device DP does not land on the tunneled chip (its [L, B, T] move
    # code tensor pads B=8 up to 128 lanes there — 16x HBM blow-up).
    # The legs run in their own subprocesses and pick their backends.
    import jax
    jax.config.update("jax_platforms", "cpu")
    from repeatresolver_tpu import config as C
    from repeatresolver_tpu.utils import io as rio
    from repeatresolver_tpu.utils.hostmem import tune_allocator
    tune_allocator()

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    sim_cfg = C.SimulatorConfig(coverage=args.c, copynumber=args.n,
                                difference=args.d / 100.0,
                                repeatlength=args.l, seed=args.seed)
    name = sim_cfg.dataset_name
    msa_path = os.path.join(wd, name + "_MSA")
    if not os.path.exists(msa_path):
        import numpy as np

        from repeatresolver_tpu.models import (initial_aligner,
                                               read_cutter, simulator)
        t0 = time.perf_counter()
        ds = simulator.simulate(sim_cfg)
        ds.write(wd)
        template = rio.read_template(
            os.path.join(wd, name + "_Template.fasta")).astype(np.int16)
        reads = [r.astype(np.int16) for r in ds.reads]
        cut = read_cutter.cut_reads(template, reads,
                                    C.ReadCutterConfig())
        seqs = [s.astype(np.int16) for s in cut.pieces]
        ia = initial_aligner.build_initial_msa(
            template, seqs, C.InitialAlignerConfig(band=args.align_band))
        initial_aligner.write_outputs(
            ia, msa_path, os.path.join(wd, name + "_SeqClass"))
        print(f"prepared {name}_MSA in {time.perf_counter() - t0:.0f}s",
              flush=True)

    msa = rio.read_msa(msa_path)
    print(f"MSA: {msa.shape[0]} rows x {msa.shape[1]} cols, band "
          f"{args.band}, block_rows {args.block_rows}", flush=True)

    tpu = run_leg(wd, msa_path, "tpu", "pallas", False,
                  args.band, args.block_rows)
    summary = {"config": vars(args), "msa_rows": int(msa.shape[0]),
               "msa_cols": int(msa.shape[1]), "tpu": tpu}
    if not args.skip_cpu:
        cpu = run_leg(wd, msa_path, "cpu", "xla", True,
                      args.band, args.block_rows)
        summary["cpu"] = cpu
        log_t = open(os.path.join(wd, "scorelog_tpu")).read()
        log_c = open(os.path.join(wd, "scorelog_cpu")).read()
        traj_equal = log_t == log_c
        msa_equal = (open(os.path.join(wd, "MSAreal_tpu"), "rb").read()
                     == open(os.path.join(wd, "MSAreal_cpu"),
                             "rb").read())
        summary["trajectory_bit_equal"] = traj_equal
        summary["msareal_byte_equal"] = msa_equal
        print(f"trajectory bit-equal: {traj_equal}  "
              f"MSAreal byte-equal: {msa_equal}", flush=True)
        if not (traj_equal and msa_equal):
            raise SystemExit("PARITY FAILURE between TPU and CPU legs")
    with open(os.path.join(wd, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
