"""Pallas TPU kernel for the staircase-band realignment fill.

Produces bit-identical move codes to ops/staircase_realign.staircase_fill
(tested, interpret mode on CPU). The division of labor:

  * XLA precompute (_windows): one gather pass building per-chunk cost
    windows [B, NC, W2] — gap, insert, one-hot-corrected substitution
    ingredients, gap-cost prefixes, band-shift amounts and jump offsets,
    validity masks. This is where all dynamic indexing lives.
  * Pallas kernel: grid (B/BR, NC); per grid step the chunk's windows
    stream into VMEM via BlockSpecs, the band state lives in a VMEM
    scratch that persists across the chunk dimension (TPU grids iterate
    the last axis innermost), and the T inner steps are pure vector
    ops: static shifts, a log-step prefix-min, and code emission. No
    gathers, no HBM traffic beyond the streamed blocks.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_realign import BIG, _row_costs

# Rows per program (sublane dimension). The step loop is a serial
# dependency chain (band carry -> shift -> min -> prefix-min) whose
# depth is independent of BR, and grid cells run sequentially on the
# one TensorCore — so BR is the ILP knob: more rows per cell means
# more independent vregs in flight per chain stage (overridable for
# on-chip sweeps via RR_PALLAS_BR).
BR = int(os.environ.get("RR_PALLAS_BR", "8"))


def _windows(counts, rows_old, seqs, ways, lengths, ncols, w, t,
             widen=1):
    """Per-chunk window tensors (XLA side)."""
    w2 = w + widen * t
    bh = w // 2
    b, c = rows_old.shape
    l = seqs.shape[1]
    nchunks = -(-l // t)
    lpad = nchunks * t
    if lpad != l:
        seqs = jnp.pad(seqs, ((0, 0), (0, lpad - l)))
        ways = jnp.pad(ways, ((0, 0), (0, lpad - l)), mode="edge")

    ns, gapcost, inscost, g = _row_costs(counts, rows_old)
    own = rows_old.astype(jnp.int32)
    pad = w2 + 1
    # counts-bounded tensors stream as int16 (row count < 32768 —
    # asserted by the caller; the reference caps MSAs at 18000 rows,
    # PW_ReAligner.c:17); flag bits ride the own-symbol byte. Halves
    # the window streaming traffic vs all-int32.
    gapp = jnp.pad(gapcost.astype(jnp.int16), ((0, 0), (0, pad)))
    insp = jnp.pad(inscost.astype(jnp.int16), ((0, 0), (0, pad)))
    nsp = jnp.pad(ns.astype(jnp.int16), ((0, 0), (0, pad)))
    gp = jnp.pad(g, ((0, 0), (0, pad)), mode="edge")
    ownp = jnp.pad(own, ((0, 0), (0, pad)), constant_values=5)
    counts4 = jnp.pad(counts.astype(jnp.int16)[:, 0:4],
                      ((0, pad), (0, 0)))

    a_chunks = jnp.maximum(0, ways - bh)[:, ::t][:, :nchunks]  # [B, NC]
    ys = a_chunks[:, :, None] + jnp.arange(w2)[None, None, :]  # [B,NC,W2]

    def gat(arr):
        return jax.vmap(jnp.take)(arr, ys)

    gap_w = gat(gapp)                                          # [B,NC,W2]
    ins_w = gat(insp)
    ns_w = gat(nsp)
    own_w = gat(ownp)
    gy1_w = jax.vmap(jnp.take)(gp, ys + 1)
    # per-symbol count planes as four full-lane streams [B,4,NC,W2]:
    # a packed [..., 4] minor dim would tile 4-in-128-lanes on TPU
    # (32x VMEM padding + slow loads — measured 5x on the whole
    # kernel); planar delivery keeps every stream in native layout
    c4_w = jnp.stack(
        [jax.vmap(jnp.take)(
            jnp.broadcast_to(counts4[:, k], (b, counts4.shape[0])), ys)
         for k in range(4)], axis=1)

    prev_a = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), a_chunks[:, :-1]], axis=1)
    dshift = jnp.clip(a_chunks - prev_a, 0, w2 + 1)            # [B, NC]
    gtop = jax.vmap(jnp.take)(gp, prev_a + w2)                 # [B, NC]

    validc = ys < ncols
    ok_ins = (ys > 0) & (ys < ncols - 1)
    # own symbol (3 bits) | valid<<3 | ok_ins<<4, one int8 stream
    flags = (own_w | (validc.astype(jnp.int32) << 3)
             | (ok_ins.astype(jnp.int32) << 4)).astype(jnp.int8)
    # Per-step scalars in sequence-native [B, Lpad] layout — each grid
    # cell streams its (BR, T) tile and the kernel reads one [BR, 1]
    # dynamic lane slice per step. The old [NC, T, B, 1] step-major
    # layout had a minor dim of 1 (128x tile padding): XLA inserted a
    # relayout copy between the producer and the Pallas custom call
    # costing more than the kernel itself.
    seq_c = seqs.astype(jnp.int32)
    # per-position reference band start in window-lane space (see
    # staircase_realign: candidates outside [way-bh, way-bh+w) must be
    # masked; the widened window is drift slack, not extra band)
    lob = (jnp.maximum(0, ways - bh).reshape(b, nchunks, t)
           - a_chunks[:, :, None]).astype(jnp.int32).reshape(b, lpad)

    def nc_major(x):             # [B, NC, ...] -> [NC, B, ...]
        return jnp.swapaxes(x, 0, 1)

    return dict(gap=nc_major(gap_w), ins=nc_major(ins_w),
                ns=nc_major(ns_w), flags=nc_major(flags),
                gy1=nc_major(gy1_w),
                c4=jnp.transpose(c4_w, (2, 1, 0, 3)),  # [NC,4,B,W2]
                dshift=dshift, gtop=gtop, seq=seq_c, lob=lob,
                a=a_chunks,
                lengths=jnp.asarray(lengths, jnp.int32).reshape(b, 1),
                nchunks=nchunks, w2=w2, lpad=lpad)


def _prefix_min(v, width):
    """Manual log-step inclusive prefix-min along the last axis."""
    k = 1
    while k < width:
        shifted = jnp.concatenate(
            [jnp.full(v.shape[:-1] + (k,), BIG, v.dtype),
             v[..., :-k]], axis=-1)
        v = jnp.minimum(v, shifted)
        k *= 2
    return v


def _kernel(w, packed, seq_ref, gap_ref, ins_ref, ns_ref, flags_ref,
            gy1_ref, c4_ref, dsh_ref, gtop_ref, lob_ref, len_ref,
            codes_ref, bandout_ref, band):
    ci = pl.program_id(1)
    t = seq_ref.shape[1]
    w2 = gap_ref.shape[2]

    gap_w = gap_ref[0].astype(jnp.int32)                # [BR, W2]
    ins_w = ins_ref[0].astype(jnp.int32)
    ns_w = ns_ref[0].astype(jnp.int32)
    flags = flags_ref[0].astype(jnp.int32)
    own_w = flags & 7
    valid = (flags & 8) != 0
    ok_ins = (flags & 16) != 0
    gy1_w = gy1_ref[0]
    # per-cell/per-step scalars live in [BR, NC] / [BR, T] tiles (one
    # or two vregs); dynamic lane slices are not lowerable on TPU, so
    # extraction is a masked lane-reduce — a few vector ops per read
    nc_n = dsh_ref.shape[1]
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (BR, nc_n), 1)
    cell_sel = lane_nc == ci
    gtop_c = jnp.sum(jnp.where(cell_sel, gtop_ref[:, :], 0),
                     axis=1, keepdims=True)             # [BR, 1]
    jadd = gy1_w - gtop_c                               # [BR, W2]
    lengths = len_ref[:, 0]
    seq_all = seq_ref[:, :]                             # [BR, T]
    lob_all = lob_ref[:, :]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (BR, t), 1)
    # hoisted once per grid cell: the 4 per-symbol count planes arrive
    # as native-layout [1, 4, BR, W2] streams (a packed [..., 4] minor
    # dim tiles 4-in-128-lanes — 32x padding, 5x slower kernel)
    c4_0 = c4_ref[0, 0].astype(jnp.int32)
    c4_1 = c4_ref[0, 1].astype(jnp.int32)
    c4_2 = c4_ref[0, 2].astype(jnp.int32)
    c4_3 = c4_ref[0, 3].astype(jnp.int32)

    # ---- chunk-boundary band shift (d >= 0) with jump fill
    @pl.when(ci == 0)
    def _():
        band[:, :] = jnp.zeros((BR, w2), jnp.int32)

    @pl.when(ci > 0)
    def _():
        bcur = band[:, :]
        lastcol = bcur[:, w2 - 1:w2]                    # [BR, 1]
        d_all = jnp.sum(jnp.where(cell_sel, dsh_ref[:, :], 0),
                        axis=1, keepdims=True)          # [BR, 1]
        # per-row left-shift by d via binary decomposition of d into
        # static shifts (mosaic has no multi-vreg lane gather); bits
        # >= w2 need no shift arm — every lane with iot + d >= w2 is
        # jump-filled below regardless (and k == w2 would slice a
        # zero-width vector, which mosaic rejects)
        shifted = bcur
        k = 1
        while k < w2:
            sh = jnp.concatenate(
                [shifted[:, k:],
                 jnp.full((BR, k), BIG, jnp.int32)], axis=1)
            shifted = jnp.where((d_all & k) != 0, sh, shifted)
            k *= 2
        iot = jax.lax.broadcasted_iota(jnp.int32, (BR, w2), 1)
        jump = lastcol + jadd
        band[:, :] = jnp.where(iot + d_all >= w2, jump, shifted)

    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (BR, w2), 1)
    big_col = jnp.full((BR, 1), BIG, jnp.int32)

    def step(tt, carry):
        bcur, word = carry
        x = ci * t + tt
        # per-step scalars: masked lane-reduce over the register-
        # resident [BR, T] tiles
        step_sel = lane_t == tt
        s = jnp.sum(jnp.where(step_sel, seq_all, 0),
                    axis=1, keepdims=True)              # [BR, 1]
        lo = jnp.sum(jnp.where(step_sel, lob_all, 0),
                     axis=1, keepdims=True)             # [BR, 1]
        inband = (lane_w2 >= lo) & (lane_w2 < lo + w)
        csel = jnp.where(
            s == 0, c4_0,
            jnp.where(s == 1, c4_1,
                      jnp.where(s == 2, c4_2, c4_3)))
        subcost = ns_w - (csel - (own_w == s))
        first = x == 0
        diag_prev = jnp.where(
            first, 0,
            jnp.concatenate([big_col, bcur[:, :-1]], axis=1))
        up_prev = jnp.where(first, 0, bcur)
        diag = diag_prev + subcost
        av = jnp.minimum(diag, jnp.where(ok_ins, up_prev + ins_w, BIG))
        av = jnp.where(valid & inband, av, BIG)
        m = _prefix_min(av - gy1_w, w2) + gy1_w
        left = jnp.concatenate([big_col, m[:, :-1]], axis=1)
        is_last = (x == lengths - 1)[:, None]
        gap_hit = (m == left + gap_w) | (is_last & (m == left))
        codes32 = jnp.where(gap_hit, 0,
                            jnp.where(m == diag, 1, 2))
        if packed:
            # 16 steps share an int32 word (2 bits each), accumulated
            # in the loop carry (registers) and flushed to the VMEM
            # output block once per word — no per-step store, no
            # per-step int32->uint8 relayout
            word = word | (codes32 << (2 * (tt & 15)))

            @pl.when((tt & 15) == 15)
            def _():
                codes_ref[0, pl.ds(tt >> 4, 1), :, :] = word[None]

            word = jnp.where((tt & 15) == 15,
                             jnp.zeros((BR, w2), jnp.int32), word)
        else:
            codes_ref[0, pl.ds(tt, 1), :, :] = \
                codes32.astype(jnp.uint8)[None, :, :]
        active = (x < lengths)[:, None]
        return (jnp.where(active, m, bcur), word)

    band_fin, _ = jax.lax.fori_loop(
        0, t, step, (band[:, :], jnp.zeros((BR, w2), jnp.int32)))
    band[:, :] = band_fin
    bandout_ref[:, :] = band_fin


@functools.partial(jax.jit,
                   static_argnames=("bandwidth", "chunk", "interpret",
                                    "widen", "time_major", "packed"))
def staircase_fill_pallas(counts, rows_old, seqs, ways, lengths, ncols,
                          *, bandwidth, chunk=256, interpret=False,
                          widen=1, time_major=False, packed=False):
    """Pallas staircase fill; same outputs as staircase_fill.

    time_major=True returns codes in the kernel's native emission
    layout [Lpad, B, W2] (Lpad = chunk-padded length) — a free reshape
    instead of the [B, L, W2] transpose, which at paper shapes
    (B=64, L~33k, W2=1640) costs a ~7 GB HBM round trip per block.
    entry_and_backtrack(time_major=True) consumes it directly.

    packed=True (requires time_major) emits 16 move codes per int32
    word (2 bits each, step-major within the word): codes
    [Lpad//16, B, W2] int32 — one quarter the HBM write traffic of the
    dominant output, accumulated in kernel registers and stored once
    per word. entry_and_backtrack(packed=True) unpacks on read."""
    w = bandwidth
    t = chunk
    b, c = rows_old.shape
    l = seqs.shape[1]
    assert b % BR == 0, f"block rows must be a multiple of {BR}"
    assert not packed or (time_major and t % 16 == 0)
    wd = _windows(counts, rows_old, seqs, ways, lengths, ncols, w, t,
                  widen=widen)
    nc = wd["nchunks"]
    w2 = wd["w2"]

    def bs(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    tc = t // 16 if packed else t
    grid = (b // BR, nc)
    codes, band_out = pl.pallas_call(
        functools.partial(_kernel, w, packed),
        grid=grid,
        in_specs=[
            bs((BR, t), lambda bg, ci: (bg, ci)),             # seq
            bs((1, BR, w2), lambda bg, ci: (ci, bg, 0)),      # gap
            bs((1, BR, w2), lambda bg, ci: (ci, bg, 0)),      # ins
            bs((1, BR, w2), lambda bg, ci: (ci, bg, 0)),      # ns
            bs((1, BR, w2), lambda bg, ci: (ci, bg, 0)),      # flags
            bs((1, BR, w2), lambda bg, ci: (ci, bg, 0)),      # gy1
            bs((1, 4, BR, w2), lambda bg, ci: (ci, 0, bg, 0)),  # c4
            bs((BR, nc), lambda bg, ci: (bg, 0)),             # dshift
            bs((BR, nc), lambda bg, ci: (bg, 0)),             # gtop
            bs((BR, t), lambda bg, ci: (bg, ci)),             # lob
            bs((BR, 1), lambda bg, ci: (bg, 0)),              # lengths
        ],
        out_specs=[
            bs((1, tc, BR, w2), lambda bg, ci: (ci, 0, bg, 0)),
            bs((BR, w2), lambda bg, ci: (bg, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, tc, b, w2),
                                 jnp.int32 if packed else jnp.uint8),
            jax.ShapeDtypeStruct((b, w2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BR, w2), jnp.int32),            # band state
        ],
        # paper shapes (band 1000, widen 4 -> w2 1512, chunk 128)
        # need ~35 MB of scoped VMEM — past XLA's 16 MB default;
        # v5e has 128 MB so the headroom is real.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(wd["seq"], wd["gap"], wd["ins"], wd["ns"], wd["flags"],
      wd["gy1"], wd["c4"], wd["dshift"], wd["gtop"], wd["lob"],
      wd["lengths"])

    if time_major:
        codes = codes.reshape(nc * tc, b, w2)
    else:
        codes = jnp.transpose(codes.reshape(nc * t, b, w2),
                              (1, 0, 2))[:, :l]
    final_a = wd["a"][:, -1]
    return codes, band_out, final_a
