"""Pallas TPU kernel for the staircase-band realignment fill.

Produces bit-identical move codes to ops/staircase_realign.staircase_fill
(tested, interpret mode on CPU; scripts/tpu_checks.py on silicon). The
division of labor:

  * XLA precompute (_fields): full-width per-row cost planes (gap,
    insert, substitution ingredients, gap-cost prefixes, flags) built
    elementwise, then a COARSE block gather extracts each chunk's
    window at BLK-element granularity only ([B, NC*W] streams, W =
    (ceil(w2/BLK)+1)*BLK). TPU element gathers run at ~1 element/cycle
    — a per-element vmap(take) window pass cost ~4x the DP kernel at
    bench shapes; gathering BLK-rows is ~BLK x cheaper.
  * Pallas kernel: grid (B/BR, NC); per grid step the chunk's
    BLK-aligned streams arrive as native (BR, W) tiles via BlockSpecs
    (auto double-buffered), an in-register lane shift by a % BLK
    recovers the exact unaligned [a, a+w2) windows, the band state
    lives in a VMEM scratch that persists across the chunk dimension
    (TPU grids iterate the last axis innermost), and the T inner steps
    are pure vector ops: static shifts, a log-step prefix-min, and
    code emission.

An in-kernel DMA design (HBM-resident fields, per-row strided copies)
was tried first and is hardware-blocked: mosaic requires DMA lane
offsets provably divisible by the 128-lane tile, and per-row
destinations in a shared (BR, ...) scratch are sublane slices, which
must be 8-aligned — per-row window extraction cannot be expressed as
DMAs without per-row 1-sublane staging buffers and strided reloads.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_realign import BIG, _row_costs

# Rows per program (sublane dimension). The step loop is a serial
# dependency chain (band carry -> shift -> min -> prefix-min) whose
# depth is independent of BR, and grid cells run sequentially on the
# one TensorCore — so BR is the ILP knob: more rows per cell means
# more independent vregs in flight per chain stage (overridable for
# on-chip sweeps via RR_PALLAS_BR). Measured on v5e at paper shapes
# (64 rows x 32k x band 1000, widen 6): BR 8 -> 7.7e9 cells/s, BR 16
# -> 1.27e10 (1.63x); BR 32 blows up Mosaic compile time (>20 min).
BR = int(os.environ.get("RR_PALLAS_BR", "16"))


# Coarse-gather granularity: window streams are extracted from the
# full-width cost fields in BLK-element rows (a 256x cheaper gather
# than per-element vmap(take) — TPU gathers run at ~1 element/cycle,
# and the element-gather pass alone cost ~4x the DP kernel at bench
# shapes). The sub-BLK remainder (a % BLK) is fixed up in-kernel by a
# register lane shift. Must be a multiple of 128 (lane tile).
BLK = int(os.environ.get("RR_PALLAS_BLK", "256"))


def _fields(counts, rows_old, seqs, ways, lengths, ncols, w, t,
            widen=1):
    """Per-chunk window streams in BLK-aligned coordinates (XLA side).

    Each field is [B, NC*W] with W = (ceil(w2/BLK)+1)*BLK: chunk ci's
    lanes [ci*W, (ci+1)*W) hold field[(a//BLK)*BLK : ... + W] — a
    block-row gather (dynamic indexing at BLK granularity only). The
    kernel streams native (BR, W) tiles and left-shifts by a % BLK in
    registers to recover the exact unaligned [a, a+w2) window.

    Counts-bounded fields travel as int16 (row count < 32768 —
    asserted by the caller; the reference caps MSAs at 18000 rows,
    PW_ReAligner.c:17); the validity bits ride the own-symbol plane."""
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
    nb = -(-w2 // BLK) + 1
    wv = nb * BLK
    cp = (-(-(c + 1) // BLK) + nb) * BLK
    pad = cp - c

    a_chunks = jnp.maximum(0, ways - bh)[:, ::t][:, :nchunks]  # [B, NC]
    idx3 = ((a_chunks // BLK)[:, :, None]
            + jnp.arange(nb, dtype=jnp.int32)[None, None, :])

    def bwin(f):
        # [B, CP] -> [B, NC*W]: gather BLK-element rows
        fb = f.reshape(b, cp // BLK, BLK)
        return jax.vmap(
            lambda fr, ix: jnp.take(fr, ix, axis=0))(fb, idx3).reshape(
            b, nchunks * wv)

    # valid<<3 | ok_ins<<4, one int16 plane (low bits free)
    ycol = jnp.arange(cp, dtype=jnp.int32)
    vb = ((ycol < ncols).astype(jnp.int16) << 3
          | (((ycol > 0) & (ycol < ncols - 1)).astype(jnp.int16) << 4))
    flags = jnp.broadcast_to(vb[None, :], (b, cp))

    # substitution-cost planes, one per symbol: the full subcost for
    # placing symbol i at column y with this row's own contribution
    # removed — sc_i = ns - counts[y, i] + (own == i). Precomputing the
    # whole expression here lets the kernel's inner step do ONE 4-way
    # select instead of select + two adds + a compare per lane, and
    # drops the separate ns stream entirely.
    def sc(i):
        sci = (ns - counts.astype(jnp.int32)[None, :, i]
               + (rows_old == i)).astype(jnp.int16)
        return bwin(jnp.pad(sci, ((0, 0), (0, pad))))

    fields = dict(
        gap=bwin(jnp.pad(gapcost.astype(jnp.int16), ((0, 0), (0, pad)))),
        ins=bwin(jnp.pad(inscost.astype(jnp.int16), ((0, 0), (0, pad)))),
        flags=bwin(flags),
        gy1=bwin(jnp.pad(g, ((0, 0), (0, pad - 1)), mode="edge")),
        sc0=sc(0), sc1=sc(1), sc2=sc(2), sc3=sc(3),
    )

    # per-step scalars in ONE sequence-native [B, Lpad] int32 tile (a
    # minor dim of 1 in the old step-major layout forced 128x-padded
    # relayouts; packing seq and lob into one plane halves the per-step
    # masked lane-reduce): comb = lob << 2 | seq.
    # lob: per-position reference band start in window-lane space (see
    # staircase_realign: candidates outside [way-bh, way-bh+w) must be
    # masked; the widened window is drift slack, not extra band)
    lob = (jnp.maximum(0, ways - bh).reshape(b, nchunks, t)
           - a_chunks[:, :, None]).astype(jnp.int32).reshape(b, lpad)
    comb = (lob << 2) | seqs.astype(jnp.int32)

    return dict(fields=fields, aint=a_chunks.astype(jnp.int32),
                comb=comb,
                lengths=jnp.asarray(lengths, jnp.int32).reshape(b, 1),
                nchunks=nchunks, w2=w2, wv=wv, lpad=lpad, a=a_chunks)


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


def _lshift(x, amt, fill, max_amt=128):
    """Per-row dynamic left lane-shift by amt in [0, max_amt] via
    binary decomposition into static shifts (mosaic has no multi-vreg
    lane gather; this is the same trick the band shift uses)."""
    br = x.shape[0]
    k = 1
    while k <= max_amt:
        sh = jnp.concatenate(
            [x[:, k:], jnp.full((br, k), fill, x.dtype)], axis=1)
        x = jnp.where((amt & k) != 0, sh, x)
        k *= 2
    return x


def _kernel(w, packed, gap_ref, ins_ref, flags_ref, gy1_ref,
            sc0_ref, sc1_ref, sc2_ref, sc3_ref, aint_ref, comb_ref,
            len_ref, codes_ref, bandout_ref, band, gtop_c, bdiag_c):
    ci = pl.program_id(1)
    t = comb_ref.shape[1]
    w2 = band.shape[1]
    BR = band.shape[0]          # rows per program (<= module BR)

    lengths = len_ref[:, 0]
    comb_all = comb_ref[:, :]                           # [BR, T]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (BR, t), 1)
    # per-row unaligned window start for this and the previous chunk,
    # via masked lane-reduce over the register-resident [BR, NC] tile
    nc = aint_ref.shape[1]
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (BR, nc), 1)
    aint = aint_ref[:, :]
    a_cur = jnp.sum(jnp.where(lane_nc == ci, aint, 0),
                    axis=1, keepdims=True)              # [BR, 1]
    a_prev = jnp.sum(jnp.where(lane_nc == ci - 1, aint, 0),
                     axis=1, keepdims=True)
    s_all = a_cur & (BLK - 1)                           # [BR, 1]

    def unal(ref, fill):
        # recover the exact unaligned [a, a + W2) window from the
        # BLK-aligned stream: shift left by a % BLK in int16 (half the
        # vregs of int32), keep the first W2 lanes — intact for any
        # s < BLK since W >= W2 + BLK
        x = _lshift(ref[:, :], s_all, fill, max_amt=BLK - 1)
        return x[:, :w2].astype(jnp.int32)

    gap_w = unal(gap_ref, 0)                            # [BR, W2]
    ins_w = unal(ins_ref, 0)
    flags = unal(flags_ref, 0)
    valid = (flags & 8) != 0
    ok_ins = (flags & 16) != 0
    sc_0 = unal(sc0_ref, 0)
    sc_1 = unal(sc1_ref, 0)
    sc_2 = unal(sc2_ref, 0)
    sc_3 = unal(sc3_ref, 0)
    # gy1[j] = g[a + 1 + j]: the aligned int32 stream shifted by s + 1
    # in one dynamic pass (a static offset-1 slice afterwards would
    # leave a lane-offset vpad that downstream concats reject)
    gy1_w = _lshift(gy1_ref[:, :], s_all + 1, 0,
                    max_amt=BLK)[:, :w2]

    # ---- chunk-boundary band shift (d >= 0) with jump fill
    @pl.when(ci == 0)
    def _():
        band[:, :] = jnp.zeros((BR, w2), jnp.int32)
        bdiag_c[:, :] = jnp.full((BR, 1), BIG, jnp.int32)

    @pl.when(ci > 0)
    def _():
        bcur = band[:, :]
        lastcol = bcur[:, w2 - 1:w2]                    # [BR, 1]
        # per-row window shift (clip as the old host-side dshift did:
        # bits >= w2 never matter — those lanes are jump-filled
        # regardless)
        d_all = jnp.clip(a_cur - a_prev, 0, w2 + 1)     # [BR, 1]
        # gtop carry: gp[a_prev + w2] is the last element of the
        # PREVIOUS chunk's gy1 window, saved below at every cell
        jadd = gy1_w - gtop_c[:, :]                     # [BR, W2]
        iot = jax.lax.broadcasted_iota(jnp.int32, (BR, w2), 1)
        # diagonal carry across the boundary (same rule as the XLA
        # staircase, see staircase_realign): the diag predecessor of
        # the new window's lane 0 is OLD window lane d-1, discarded by
        # the left-shift. gp[a] = gy1[0] - gapcost[a].
        g0 = gy1_w[:, 0:1] - gap_w[:, 0:1]
        old_dm1 = jnp.sum(jnp.where(iot == d_all - 1, bcur, 0),
                          axis=1, keepdims=True)        # [BR, 1]
        bjump0 = lastcol + (g0 - gtop_c[:, :])
        bdiag_c[:, :] = jnp.where(
            d_all == 0, BIG,
            jnp.where(d_all - 1 >= w2, bjump0, old_dm1))
        # per-row left-shift by d via binary decomposition of d into
        # static shifts; bits >= w2 need no shift arm — every lane
        # with iot + d >= w2 is jump-filled below regardless
        shifted = bcur
        k = 1
        while k < w2:
            sh = jnp.concatenate(
                [shifted[:, k:],
                 jnp.full((BR, k), BIG, jnp.int32)], axis=1)
            shifted = jnp.where((d_all & k) != 0, sh, shifted)
            k *= 2
        jump = lastcol + jadd
        band[:, :] = jnp.where(iot + d_all >= w2, jump, shifted)

    gtop_c[:, :] = gy1_w[:, w2 - 1:w2]

    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (BR, w2), 1)
    big_col = jnp.full((BR, 1), BIG, jnp.int32)

    def step(tt, carry):
        bcur, word = carry
        x = ci * t + tt
        # per-step scalars: ONE masked lane-reduce over the register-
        # resident packed [BR, T] tile (comb = lob << 2 | seq)
        step_sel = lane_t == tt
        cm = jnp.sum(jnp.where(step_sel, comb_all, 0),
                     axis=1, keepdims=True)             # [BR, 1]
        s = cm & 3
        lo = cm >> 2
        inband = (lane_w2 >= lo) & (lane_w2 < lo + w)
        subcost = jnp.where(
            s == 0, sc_0,
            jnp.where(s == 1, sc_1,
                      jnp.where(s == 2, sc_2, sc_3)))
        first = x == 0
        # lane 0's diag predecessor: BIG in-chunk (col a-1 is below
        # the window), the boundary carry on the chunk's first step
        lane0 = jnp.where(tt == 0, bdiag_c[:, :], big_col)
        diag_prev = jnp.where(
            first, 0,
            jnp.concatenate([lane0, bcur[:, :-1]], axis=1))
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

    packed=True (requires time_major) emits 16 move codes per int32
    word (2 bits each, step-major within the word): codes
    [Lpad//16, B, W2] int32 — one quarter the HBM write traffic of the
    dominant output, accumulated in kernel registers and stored once
    per word. pallas_backtrack.entry_and_backtrack_pallas consumes
    this layout directly (one word tile per 16-x grid cell)."""
    w = bandwidth
    t = chunk
    b, c = rows_old.shape
    l = seqs.shape[1]
    br_ = next(v for v in (BR, 8, 4, 2, 1) if b % v == 0)
    assert not packed or (time_major and t % 16 == 0)
    wd = _fields(counts, rows_old, seqs, ways, lengths, ncols, w, t,
                 widen=widen)
    nc = wd["nchunks"]
    w2 = wd["w2"]
    wv = wd["wv"]
    f = wd["fields"]

    def bs(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    win = bs((br_, wv), lambda bg, ci: (bg, ci))
    tc = t // 16 if packed else t
    grid = (b // br_, nc)
    codes, band_out = pl.pallas_call(
        functools.partial(_kernel, w, packed),
        grid=grid,
        in_specs=[
            win, win, win, win,                      # gap ins fl gy1
            win, win, win, win,                      # sc0..sc3
            bs((br_, nc), lambda bg, ci: (bg, 0)),            # aint
            bs((br_, t), lambda bg, ci: (bg, ci)),            # comb
            bs((br_, 1), lambda bg, ci: (bg, 0)),             # lengths
        ],
        out_specs=[
            bs((1, tc, br_, w2), lambda bg, ci: (ci, 0, bg, 0)),
            bs((br_, w2), lambda bg, ci: (bg, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, tc, b, w2),
                                 jnp.int32 if packed else jnp.uint8),
            jax.ShapeDtypeStruct((b, w2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((br_, w2), jnp.int32),           # band state
            pltpu.VMEM((br_, 1), jnp.int32),            # gtop carry
            pltpu.VMEM((br_, 1), jnp.int32),            # boundary diag
        ],
        # paper shapes (band 1000, widen 4 -> w2 1512, chunk 128)
        # need ~35 MB of scoped VMEM — past XLA's 16 MB default;
        # v5e has 128 MB so the headroom is real.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(f["gap"], f["ins"], f["flags"], f["gy1"],
      f["sc0"], f["sc1"], f["sc2"], f["sc3"],
      wd["aint"], wd["comb"], wd["lengths"])

    if time_major:
        codes = codes.reshape(nc * tc, b, w2)
    else:
        codes = jnp.transpose(codes.reshape(nc * t, b, w2),
                              (1, 0, 2))[:, :l]
    final_a = wd["a"][:, -1]
    return codes, band_out, final_a
