#!/usr/bin/env python
"""On-chip decomposition of the fused device step at bench shapes.

Times, each chained inside one dispatch so the tunnel RTT amortizes:
  fill      - pallas staircase fill (packed time-major), the baseline
  fused     - fill + entry_and_backtrack (the production device step)
  scatter   - microbenchmark: one [B, CH*U] drop-mode scatter into
              [B, cpad] (the replay's write primitive) under different
              XLA scatter hints, to locate the fused gap's cost center

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_backtrack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import bench


def timeit(fn, n=5):
    fn()
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from repeatresolver_tpu.ops import banded_realign as br
    from repeatresolver_tpu.ops import pallas_realign as pr
    from repeatresolver_tpu.ops import staircase_realign as sr

    print(f"backend={jax.default_backend()}", flush=True)
    counts, msa, seqs, ways, lengths, b, l, w, c = bench._inputs()
    args = tuple(jax.device_put(jnp.asarray(x))
                 for x in (counts, msa, seqs, ways, lengths))
    t = 128
    anf_full = np.asarray(sr.staircase_anf(ways, lengths, w, t, c))
    bh = w // 2
    last_way = ways[np.arange(b), lengths - 1]
    entry_bound = np.maximum(-1, last_way - bh).astype(np.int32)
    anf_d = jax.device_put(jnp.asarray(anf_full))
    eb_d = jax.device_put(jnp.asarray(entry_bound))
    chain = 4
    cells = b * l * w * chain

    def fill_step(cn):
        out = pr.staircase_fill_pallas(
            cn, *args[1:], np.int32(c), bandwidth=w, chunk=t,
            time_major=True, packed=True)
        return out[1][0, 0]

    from repeatresolver_tpu.ops import pallas_backtrack as pb
    aint_d = jax.device_put(jnp.asarray(anf_full[:, ::t].copy()))

    def fused_step(cn, stage="full"):
        codes, fband, fanf = pr.staircase_fill_pallas(
            cn, *args[1:], np.int32(c), bandwidth=w, chunk=t,
            time_major=True, packed=True)
        wayin, best = pb._entry_scan(fband, fanf, eb_d, np.int32(c),
                                     cpad=c, bandwidth=w + t)
        if stage == "entry":
            return wayin[0] + codes[0, 0, 0]
        moves = pb._backtrack_moves(codes, wayin, aint_d, args[4],
                                    w2=w + t, chunk=t)
        if stage == "kernel":
            return moves[0, 0, 0] + best[0]
        new_rows, best, iy, ib, inn = pb._moves_to_outputs(
            moves, args[2], args[4], best, cpad=c)
        return new_rows[0, 0].astype(jnp.int32)

    def fused_xla_step(cn):
        # the generic XLA walk on unpacked staircase codes (the
        # non-pallas fallback path), for comparison
        from repeatresolver_tpu.ops import staircase_realign as sr2
        codes, fband, fanf = sr2.staircase_fill(
            cn, *args[1:], np.int32(c), bandwidth=w, chunk=t)
        new_rows, best, iy, ib, inn = br.entry_and_backtrack(
            codes, fband, fanf, args[2], anf_d, eb_d, args[4],
            np.int32(c), cpad=c, bandwidth=w + t)
        return new_rows[0, 0].astype(jnp.int32)

    def chained(step):
        @jax.jit
        def f():
            acc = jnp.int32(0)
            for i in range(chain):
                cn = args[0] + (acc & 1) if i else args[0]
                acc = acc + step(cn)
            return acc
        return lambda: int(np.asarray(f()))

    import functools
    stages = [
        ("fill", fill_step),
        ("f+entry", functools.partial(fused_step, stage="entry")),
        ("f+kernel", functools.partial(fused_step, stage="kernel")),
        ("fused", fused_step),
    ]
    if os.environ.get("RR_PROFILE_XLA_BT"):
        stages.append(("fused_xla", fused_xla_step))
    for name, step in stages:
        dt = timeit(chained(step))
        print(f"{name:8s} {dt*1e3/chain:8.1f} ms/iter  "
              f"{cells/dt:.3e} cells/s", flush=True)

    # ---- scatter microbenchmarks (the replay's write primitive)
    ch, u = 512, 32
    lanes = ch * u
    rng = np.random.default_rng(0)
    # ~6k real lanes (descending unique y per row), rest oob-dropped
    nreal = 6144
    idx = np.full((b, lanes), c, np.int32)
    ys = np.arange(nreal, dtype=np.int32)[::-1]
    idx[:, :nreal] = ys[None, :] % c
    vals = rng.integers(0, 4, (b, lanes)).astype(np.int8)
    idx_d = jax.device_put(jnp.asarray(idx))
    vals_d = jax.device_put(jnp.asarray(vals))
    bidx = jnp.arange(b)
    out0 = jnp.full((b, c), 5, jnp.int8)
    k = 8

    def mk(fn):
        @jax.jit
        def f(off):
            acc = jnp.int8(0)
            o = out0
            for i in range(k):
                o = fn(o, idx_d, vals_d + acc)
                acc = o[0, 0]
            return acc
        return lambda: int(np.asarray(f(0)))

    def plain(o, ix, v):
        return o.at[bidx[:, None], ix].set(v, mode="drop")

    def uniq(o, ix, v):
        return o.at[bidx[:, None], ix].set(v, mode="drop",
                                           unique_indices=True)

    def srt(o, ix, v):
        # lanes already descending per row; reverse to ascending
        return o.at[bidx[:, None], ix[:, ::-1]].set(
            v[:, ::-1], mode="drop", unique_indices=True,
            indices_are_sorted=True)

    for name, fn in (("scatter/plain", plain),
                     ("scatter/unique", uniq),
                     ("scatter/sorted+uniq", srt)):
        dt = timeit(mk(fn))
        print(f"{name:22s} {dt*1e3/k:8.2f} ms/call "
              f"({lanes*b/ (dt/k):.3e} lanes/s)", flush=True)

    # int32 packed variant (iyb-style)
    vals32 = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 20, (b, lanes)).astype(np.int32)))
    out32 = jnp.zeros((b, c), jnp.int32)

    def mk32(flags):
        @jax.jit
        def f(off):
            acc = jnp.int32(0)
            o = out32
            for i in range(k):
                o = o.at[bidx[:, None], idx_d].set(
                    vals32 + acc, mode="drop", **flags)
                acc = o[0, 0]
            return acc
        return lambda: int(np.asarray(f(0)))

    for name, flags in (("scatter32/plain", {}),
                        ("scatter32/unique", dict(unique_indices=True))):
        dt = timeit(mk32(flags))
        print(f"{name:22s} {dt*1e3/k:8.2f} ms/call", flush=True)

    # cumsum cost (the replay's other primitive): 3x [B, lanes] int32
    m_d = jax.device_put(jnp.asarray(
        rng.integers(0, 4, (b, lanes)).astype(np.int32)))

    @jax.jit
    def cums(off):
        m = m_d + off
        dy = ((m == 0) | (m == 1)).astype(jnp.int32)
        dx = ((m == 1) | (m == 2)).astype(jnp.int32)
        a = jnp.cumsum(dy, axis=1)
        bq = jnp.cumsum(dx, axis=1)
        cq = jnp.cumsum((m == 2).astype(jnp.int32), axis=1)
        return (a + bq + cq)[0, -1]

    dt = timeit(lambda: int(np.asarray(cums(0))))
    print(f"{'cumsum x3':22s} {dt*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
