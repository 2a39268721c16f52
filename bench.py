#!/usr/bin/env python
"""Benchmark: banded realignment DP cell-update rate per chip.

Prints ONE JSON line whose headline is the best production engine rate
on this host, with per-backend rates reported explicitly (no max()
hiding): `backends` carries the TPU device numbers (XLA band fill,
Pallas staircase fill, fused fill+backtrack) alongside the XLA:CPU and
native C++ rates, `roofline` carries the analytic speed-of-light for
the kernel on real v5e silicon, and `device_matmul` quantifies how far
this session's tunneled device sits under v5e peak on a known-FLOPs
matmul (the "emulator discount").

BASELINE = 8.33e7 cells/s: the reference PW_ReAligner (single-thread C,
gcc -O2) measured on this host (60x3000 synthetic MSA, band 1000,
5 rounds in 9.6 s; cells = sum(row lengths) x band x rounds). The
reference's qualitative number — "run over a weekend" for the paper
dataset (~4e11 cells/round, README.md:71) — is consistent with this
rate (~80 min/round, ~35 rounds).

Roofline (documented so the emulator discount is a number, not a vibe):
the production TPU kernel (ops/pallas_realign.py) runs the staircase
DP on the VPU. Per inner step it updates a W2 = W + widen*T lane window
with ~40 int32 ops per lane (cost select 6, subcost 3, diag/ins mins 6,
log-step prefix-min over W2 ~ 17, code emission + packed RMW ~10),
i.e. ~42 * W2/W ~ 63 VPU ops per *counted* band cell (the metric
counts B*L*W). HBM traffic: the move codes leave the kernel 2-bit
packed in time-major layout (no transpose) = W2/W/4 ~ 0.4 B/cell, plus
~0.15 B/cell of window streams (19 B/lane amortized over T=128 steps)
=> ~0.6 B/cell. v5e public specs (jax-ml.github.io/scaling-book): VPU
8x128 lanes x 4 ALUs x ~0.94 GHz = 3.85e12 int32 op/s, HBM 819 GB/s =>
  VPU bound  : 3.85e12 / 63  ~ 6.1e10 cells/s/chip
  HBM bound  : 8.19e11 / 0.6 ~ 1.4e12 cells/s/chip
  speed of light = min = ~6.1e10 cells/s/chip  (~730x reference C).

Measurement notes for this environment: the TPU sits behind a network
relay with a ~60s cold handshake and unreliable block_until_ready, so
completion is forced with a tiny dependent readback, inputs are
device_put once, warm-up calls are excluded, and each backend is
measured in a subprocess so a hung tunnel cannot take down the bench.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_S = 8.33e7

# v5e public specs (scaling book / cloud.google.com/tpu/docs/v5e)
V5E_VPU_OPS = 8 * 128 * 4 * 0.94e9     # 3.85e12 int32 op/s
V5E_HBM_BPS = 819e9
V5E_BF16_FLOPS = 1.97e14

# kernel cost model (see module docstring)
OPS_PER_CELL = 63.0
BYTES_PER_CELL = 0.6


def _inputs(b=64, l=2048, w=512, c=4096):
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
    return counts, msa, seqs, ways, lengths, b, l, w, c


def measure(backend=None, variant="fill"):
    """variant: 'fill' (XLA exact-band fill), 'pallas' (staircase
    Pallas fill, the production TPU kernel), 'fused' (fill +
    device backtrack, the full in-pipeline device step)."""
    import jax
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from repeatresolver_tpu.ops import banded_realign as br

    counts, msa, seqs, ways, lengths, b, l, w, c = _inputs()
    args = tuple(jax.device_put(jnp.asarray(x))
                 for x in (counts, msa, seqs, ways, lengths))

    if variant == "pallas":
        from repeatresolver_tpu.ops import pallas_realign as pr
        interp = jax.default_backend() == "cpu"

        def run():
            out = pr.staircase_fill_pallas(
                *args, np.int32(c), bandwidth=w, chunk=128,
                interpret=interp)
            return int(np.asarray(out[1][0, 0]))
    elif variant == "pallas_fused":
        # the production TPU step: time-major Pallas staircase fill
        # (no codes transpose) + device entry/backtrack
        from repeatresolver_tpu.ops import pallas_realign as pr
        from repeatresolver_tpu.ops import staircase_realign as sr
        interp = jax.default_backend() == "cpu"
        t = 128
        anf_full = np.asarray(sr.staircase_anf(ways, lengths, w, t, c))
        bh = w // 2
        last_way = ways[np.arange(b), lengths - 1]
        entry_bound = np.maximum(-1, last_way - bh).astype(np.int32)
        anf_d = jax.device_put(jnp.asarray(anf_full))
        eb_d = jax.device_put(jnp.asarray(entry_bound))

        def run():
            codes, fband, fanf = pr.staircase_fill_pallas(
                *args, np.int32(c), bandwidth=w, chunk=t,
                interpret=interp, time_major=True, packed=True)
            new_rows, best, iy, ib, inn = br.entry_and_backtrack(
                codes, fband, fanf, args[2], anf_d, eb_d, args[4],
                np.int32(c), cpad=c, bandwidth=w + t,
                time_major=True, packed=True)
            return int(np.asarray(new_rows[0, 0]))
    elif variant == "fused":
        bh = w // 2
        anf_full = np.maximum(0, ways - bh).astype(np.int32)
        last_way = ways[np.arange(b), lengths - 1]
        entry_bound = np.maximum(-1, last_way - bh).astype(np.int32)
        anf_d = jax.device_put(jnp.asarray(anf_full))
        eb_d = jax.device_put(jnp.asarray(entry_bound))

        def run():
            codes, fband, fanf = br.banded_fill(*args, np.int32(c),
                                                bandwidth=w)
            new_rows, best, iy, ib, inn = br.entry_and_backtrack(
                codes, fband, fanf, args[2], anf_d, eb_d, args[4],
                np.int32(c), cpad=c, bandwidth=w)
            return int(np.asarray(new_rows[0, 0]))
    else:
        def run():
            out = br.banded_fill(*args, np.int32(c), bandwidth=w)
            return int(np.asarray(out[1][0, 0]))

    run()  # compile
    run()  # warm (the tunneled backend's first calls are erratic)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    platform = jax.devices()[0].platform
    return b * l * w / min(times), platform


def measure_matmul_discount():
    """Known-FLOPs bf16 matmul on the default device: achieved FLOP/s
    and the factor by which it sits under real v5e peak. On genuine
    silicon this is ~1-2x; the session's tunneled device measures
    orders of magnitude higher — that factor contextualizes every
    device rate in this file."""
    import jax
    import jax.numpy as jnp
    n = 4096
    x = jax.device_put(jnp.ones((n, n), jnp.bfloat16))
    f = jax.jit(lambda a: a @ a)
    r = f(x)
    _ = np.asarray(r[0, 0])
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = f(x)
        _ = np.asarray(r[0, 0])
        times.append(time.perf_counter() - t0)
    achieved = 2 * n ** 3 / min(times)
    return achieved, V5E_BF16_FLOPS / achieved


def measure_native():
    """The framework's native C++ block kernel (fill + backtrack fused,
    OpenMP) — the production engine for CPU-bound environments."""
    from repeatresolver_tpu.utils import native as nat

    counts, msa, seqs, ways, lengths, b, l, w, c = _inputs()
    if nat.realign_block(counts, msa, seqs, ways, lengths, w) is None:
        return None
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        nat.realign_block(counts, msa, seqs, ways, lengths, w)
        times.append(time.perf_counter() - t0)
    return b * l * w / min(times)


def _subprocess_rates(backend, variants):
    """Measure variants in a subprocess (hung tunnel isolation)."""
    import subprocess
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "for v in %r:\n"
        "    try:\n"
        "        r, p = bench.measure(backend=%r if %r != 'default'"
        " else None, variant=v)\n"
        "        print('RATE', v, r, p)\n"
        "    except Exception as e:\n"
        "        print('FAIL', v, type(e).__name__)\n"
        % (os.path.dirname(os.path.abspath(__file__)), list(variants),
           backend, backend))
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    out = {}
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=600, env=env)
        for line in res.stdout.splitlines():
            parts = line.split()
            if parts and parts[0] == "RATE":
                out[parts[1]] = (float(parts[2]), parts[3])
    except Exception:
        pass
    return out


def _subprocess_matmul():
    import subprocess
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "a, d = bench.measure_matmul_discount()\n"
        "print('MM', a, d)\n"
        % os.path.dirname(os.path.abspath(__file__)))
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=420)
        for line in res.stdout.splitlines():
            if line.startswith("MM"):
                _, a, d = line.split()
                return float(a), float(d)
    except Exception:
        pass
    return None, None


def main():
    backends = {}
    # the session's default backend (tunneled TPU when available)
    dev = _subprocess_rates("default",
                            ("fill", "pallas", "pallas_fused", "fused"))
    if dev:
        plat = next(iter(dev.values()))[1]
        backends[plat] = {v: round(r) for v, (r, _) in dev.items()}
    cpu = _subprocess_rates("cpu", ("fill", "fused"))
    if cpu and "cpu" not in backends:
        backends["cpu"] = {v: round(r) for v, (r, _) in cpu.items()}
    nat = measure_native()
    if nat is not None:
        backends["native-cpu"] = {"fused": round(nat)}

    mm_flops, mm_discount = _subprocess_matmul()

    vpu_bound = V5E_VPU_OPS / OPS_PER_CELL
    hbm_bound = V5E_HBM_BPS / BYTES_PER_CELL
    sol = min(vpu_bound, hbm_bound)
    tpu_rates = {k: v for k, v in backends.items()
                 if k not in ("cpu", "native-cpu")}
    tpu_best = max((max(d.values()) for d in tpu_rates.values()),
                   default=None)

    # headline: the best fused (fill+backtrack, what the pipeline runs)
    # production rate on this host; every backend is also reported.
    prod = ("fused", "pallas", "pallas_fused")
    candidates = [d.get(v, 0) for d in backends.values() for v in prod]
    rate = max(candidates) if candidates else 0
    headline_backend = next(
        (k for k, d in backends.items()
         if max(d.get(v, 0) for v in prod) == rate), "?")

    out = {
        "metric": "dp_cell_updates_per_s",
        "value": round(rate),
        "unit": "cells/s",
        "vs_baseline": round(rate / BASELINE_CELLS_PER_S, 2),
        "backend": headline_backend,
        "backends": backends,
        "device_matmul": {
            "achieved_flops": mm_flops and round(mm_flops),
            "v5e_peak_factor_under": mm_discount and round(mm_discount,
                                                           1),
        },
        "roofline_v5e": {
            "ops_per_cell": OPS_PER_CELL,
            "bytes_per_cell": BYTES_PER_CELL,
            "vpu_bound_cells_per_s": round(vpu_bound),
            "hbm_bound_cells_per_s": round(hbm_bound),
            "speed_of_light_cells_per_s": round(sol),
            "sol_vs_baseline": round(sol / BASELINE_CELLS_PER_S, 1),
            "tpu_measured_mfu": (tpu_best and round(tpu_best / sol, 6)),
            "tpu_mfu_x_matmul_discount": (
                tpu_best and mm_discount and
                round(tpu_best * mm_discount / sol, 3)),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
