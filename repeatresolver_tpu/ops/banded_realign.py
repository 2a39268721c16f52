"""Batched banded realignment DP — the device path of the realigner.

Implements the PW_ReAligner recurrence (PW_ReAligner.c:1493-1513) for a
BLOCK of rows at once, each against the shared column histogram with its
own contribution removed (block-Jacobi; block size 1 reproduces the
reference Gauss-Seidel trajectory exactly — tested).

Per scan step x (sequential over sequence positions), all rows process
their bandwidth-W window in parallel on the VPU:

    A[y]  = min( M[x-1,y-1] + Score(y, base_x),
                 M[x-1,y]   + max(Score(y,5), Score(y-1,5)) )   0<y<C-1
    M[x,y] = min_{j<=y} A[j] + sum_{t=j+1..y} Score(t,4)
           = Gy[y] + cummin( A - Gy )                (associative scan)

Off-band-above reads of the previous row pay the per-column gap cost
(the reference's MatrixOut jump rule, :285-295) via the gap-cost prefix
sums G. Move codes carry the backtracker's priority (gap > diagonal >
insert, :1375-1410); the backtrack itself runs on device as a lockstep
while_loop so only the rewritten rows and insert lists leave the chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 30)
MAX_INSERTS = 512


def _row_costs(counts, rows_old):
    """Per-row cost arrays with own contribution removed.
    Returns ns, gapcost, inscost [B, C] and gap prefix G [B, C+1]."""
    counts = counts.astype(jnp.int32)
    own = rows_old.astype(jnp.int32)
    ns_all = counts[:, 0:5].sum(axis=1)
    ns = ns_all[None, :] - (own < 5)
    gapcost = ns - (counts[None, :, 4] - (own == 4))
    inscost = jnp.maximum(ns, jnp.concatenate(
        [ns[:, :1], ns[:, :-1]], axis=1))
    b = rows_old.shape[0]
    g = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.cumsum(gapcost, axis=1, dtype=jnp.int32)], axis=1)
    return ns, gapcost, inscost, g


@functools.partial(jax.jit, static_argnames=("bandwidth",))
def banded_fill(counts, rows_old, seqs, ways, lengths, ncols, *,
                bandwidth):
    """DP fill for a block.

    counts: int32 [Cp, 6]; rows_old: int8 [B, Cp]; seqs: int8 [B, L];
    ways: int32 [B, L]; lengths: int32 [B]; ncols: real column count
    (arrays may be padded beyond it — padding must be symbol 5 / zero
    counts).
    Returns (codes uint8 [B, L, W], final_band int32 [B, W],
             final_anf int32 [B]).
    """
    w = bandwidth
    bh = w // 2
    b, c = rows_old.shape
    l = seqs.shape[1]
    ns, gapcost, inscost, g = _row_costs(counts, rows_old)
    own = rows_old.astype(jnp.int32)

    pad = w + 1
    nsp = jnp.pad(ns, ((0, 0), (0, pad)))
    gapp = jnp.pad(gapcost, ((0, 0), (0, pad)))
    insp = jnp.pad(inscost, ((0, 0), (0, pad)))
    gp = jnp.pad(g, ((0, 0), (0, pad)), mode="edge")     # [B, C+1+pad]
    ownp = jnp.pad(own, ((0, 0), (0, pad)), constant_values=5)
    countsp = jnp.pad(counts.astype(jnp.int32)[:, 0:4],
                      ((0, pad), (0, 0)))                # [C+pad, 4]

    arange_w = jnp.arange(w, dtype=jnp.int32)

    def slice_w(arr_r, start):
        return jax.lax.dynamic_slice(arr_r, (start,), (w,))

    def step(carry, x):
        prev_band, prev_anf = carry
        s = seqs[:, x].astype(jnp.int32)
        center = ways[:, x]
        anf = jnp.maximum(0, center - bh)                # [B]
        ys = anf[:, None] + arange_w[None, :]            # [B, W]
        validc = ys < ncols

        gap_w = jax.vmap(slice_w)(gapp, anf)
        ins_w = jax.vmap(slice_w)(insp, anf)
        ns_w = jax.vmap(slice_w)(nsp, anf)
        gy1_w = jax.vmap(slice_w)(gp, anf + 1)
        own_w = jax.vmap(slice_w)(ownp, anf)

        def count_slice(anf_b, s_b):
            col = jax.lax.dynamic_slice(countsp, (anf_b, 0), (w, 4))
            return jnp.take_along_axis(
                col, jnp.full((w, 1), s_b, jnp.int32), axis=1)[:, 0]
        cnt_w = jax.vmap(count_slice)(anf, s)            # [B, W]
        subcost = ns_w - (cnt_w - (own_w == s[:, None]))

        d = anf - prev_anf
        gtop = jax.vmap(lambda gp_r, pa: gp_r[pa + w])(gp, prev_anf)

        def prev_read(offset):
            j = arange_w[None, :] + d[:, None] + offset
            inb = (j >= 0) & (j < w)
            base = jnp.take_along_axis(prev_band,
                                       jnp.clip(j, 0, w - 1), axis=1)
            ytgt = jnp.clip(ys + offset + 1, 0, gp.shape[1] - 1)
            gy = jnp.take_along_axis(gp, ytgt, axis=1)
            jump = prev_band[:, w - 1:w] + (gy - gtop[:, None])
            return jnp.where(inb, base,
                             jnp.where(j >= w, jump, BIG))

        first = x == 0
        diag_prev = jnp.where(first, 0, prev_read(-1))
        up_prev = jnp.where(first, 0, prev_read(0))

        diag = diag_prev + subcost
        ok_ins = (ys > 0) & (ys < ncols - 1)
        a = jnp.minimum(diag,
                        jnp.where(ok_ins, up_prev + ins_w, BIG))
        a = jnp.where(validc, a, BIG)
        m = jax.lax.associative_scan(jnp.minimum, a - gy1_w,
                                     axis=1) + gy1_w

        left = jnp.concatenate(
            [jnp.full((b, 1), BIG, jnp.int32), m[:, :-1]], axis=1)
        # Backtracker priority (PW_ReAligner.c:1375-1410): gap first,
        # then the x==L-1 flat-space arm (M == left, :1386), then
        # diagonal, then insert.
        is_last = (x == lengths - 1)[:, None]
        gap_hit = (m == left + gap_w) | (is_last & (m == left))
        codes = jnp.where(gap_hit, jnp.uint8(0),
                          jnp.where(m == diag, jnp.uint8(1),
                                    jnp.uint8(2)))

        active = x < lengths
        new_band = jnp.where(active[:, None], m, prev_band)
        new_anf = jnp.where(active, anf, prev_anf)
        return (new_band, new_anf), codes

    band0 = jnp.zeros((b, w), jnp.int32)
    anf0 = jnp.zeros((b,), jnp.int32)
    (final_band, final_anf), codes = jax.lax.scan(
        step, (band0, anf0), jnp.arange(l, dtype=jnp.int32))
    return (jnp.transpose(codes, (1, 0, 2)), final_band, final_anf)


@functools.partial(jax.jit, static_argnames=("bandwidth", "cpad"))
def entry_and_backtrack(codes, final_band, final_anf, seqs, ways,
                        lengths, ncols, *, cpad, bandwidth):
    """Entry-column scan + lockstep backtracking on device.

    ncols is the real (dynamic) column count; cpad the static padded
    capacity of the output row buffer. Returns (new_rows int8 [B, cpad]
    with 4/base placements (5 default), best int32 [B], ins_y int32
    [B, K], ins_base int8 [B, K], ins_n int32 [B])."""
    w = bandwidth
    bh = w // 2
    b = seqs.shape[0]
    l = seqs.shape[1]

    # ---- entry scan over M[L-1, y] for y in (bound, ncols-1]
    ycols = jnp.arange(cpad, dtype=jnp.int32)[None, :]
    j = ycols - final_anf[:, None]
    inband = (j >= 0) & (j < w)
    vals = jnp.take_along_axis(final_band,
                               jnp.clip(j, 0, w - 1), axis=1)
    flat = final_band[:, w - 1:w]
    vals = jnp.where(inband, vals, jnp.where(j >= w, flat, BIG))
    vals = jnp.where(ycols < ncols, vals, BIG)
    last_center = jnp.take_along_axis(
        ways, jnp.maximum(lengths - 1, 0)[:, None], axis=1)[:, 0]
    bound = jnp.maximum(-1, last_center - bh)
    scan_ok = (ycols > bound[:, None]) & (ycols < ncols)
    scan_vals = jnp.where(scan_ok, vals, BIG)
    # the reference initializes best at y = C-1 regardless of bound
    scan_vals = jnp.where(ycols == ncols - 1, vals, scan_vals)
    rev = scan_vals[:, ::-1]                 # ties -> largest y
    wayin = (cpad - 1 - jnp.argmin(rev, axis=1)).astype(jnp.int32)
    best = jnp.take_along_axis(scan_vals, wayin[:, None], axis=1)[:, 0]

    seqs8 = seqs.astype(jnp.int8)
    bidx = jnp.arange(b)

    def cond(state):
        x, y, out, iy, ib, inn, it = state
        return jnp.any((x > -1) & (y > -1)) & (it < cpad + l + w + 8)

    def body(state):
        x, y, out, iy, ib, inn, it = state
        active = (x > -1) & (y > -1)
        xs = jnp.maximum(x, 0)
        ysafe = jnp.maximum(y, 0)
        center = jnp.take_along_axis(ways, xs[:, None], axis=1)[:, 0]
        anf = jnp.maximum(0, center - bh)
        top = anf + w - 1
        above = y > top
        off = jnp.clip(y - anf, 0, w - 1)
        code = jnp.take_along_axis(
            codes[bidx, xs], off[:, None], axis=1)[:, 0]
        is_last = x == lengths - 1
        sx = jnp.take_along_axis(seqs8, xs[:, None], axis=1)[:, 0]

        gap_move = active & (above | (code == 0))
        diag_move = active & ~above & (code == 1)
        ins_move = active & ~above & (code == 2)

        write_gap = gap_move & ~is_last
        sym = jnp.where(diag_move, sx, jnp.int8(4))
        do_write = write_gap | diag_move
        out = out.at[bidx, ysafe].set(
            jnp.where(do_write, sym, out[bidx, ysafe]))

        slot = jnp.clip(inn, 0, MAX_INSERTS - 1)
        iy = iy.at[bidx, slot].set(
            jnp.where(ins_move, y, iy[bidx, slot]))
        ib = ib.at[bidx, slot].set(
            jnp.where(ins_move, sx, ib[bidx, slot]))
        inn = inn + ins_move.astype(jnp.int32)

        y = y - (gap_move | diag_move).astype(jnp.int32)
        x = x - (diag_move | ins_move).astype(jnp.int32)
        return (x, y, out, iy, ib, inn, it + 1)

    out0 = jnp.full((b, cpad), 5, jnp.int8)
    iy0 = jnp.zeros((b, MAX_INSERTS), jnp.int32)
    ib0 = jnp.zeros((b, MAX_INSERTS), jnp.int8)
    inn0 = jnp.zeros((b,), jnp.int32)
    state = (lengths - 1, wayin, out0, iy0, ib0, inn0, jnp.int32(0))
    x, y, out, iy, ib, inn, _ = jax.lax.while_loop(cond, body, state)
    return out, best, iy, ib, inn
