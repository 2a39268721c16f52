"""Pallas TPU backtrack for the packed staircase fill.

Replaces the XLA record-loop + vectorized-replay backtrack
(banded_realign._backtrack_packed) on the production TPU path. That
design paid, per block, a while_loop whose every trip randomly
gathered move words from the HBM-resident codes tensor (~55 us/trip of
gather latency) plus a replay pass whose gathers/scatters ran over
trip-padded lanes — together costing ~1.6x the DP fill itself
(round-3 bench: pallas_fused 1.24e9 vs pallas fill 3.3e9 cells/s).

This kernel exploits the structural fact that makes the walk
vectorizable: **each sequence position x is consumed by exactly one
move** (a diagonal or an insertion, PW_ReAligner.c:1394-1410), and the
gap moves between two x-moves form one maximal run of code-0 cells at
a single x (the prefix-min arm, :1375-1384). So the walk is re-indexed
by absolute x, descending:

  * grid = (rows/BR, NW) over the packed time-major codes [NW, B, WC]
    (one int32 word = 16 x-steps at one window lane), second axis
    iterated in REVERSE via the BlockSpec index map — each grid cell's
    word tile arrives in VMEM auto-double-buffered, no gathers;
  * per x (16 static sub-steps per cell), every row resolves its gap
    run AND its x-move in ONE masked max-reduce: over candidate lanes
    `<= j` with code != 0, max of (lane << 2 | code) yields both the
    move lane and its code — above-window forced gaps (the band-jump
    rule, PW_ReAligner.c:285-295) fall out of the clamp, in-window gap
    runs are the skipped lanes;
  * rows need NO per-row x state (x is the global walk position; a row
    is active iff x < its length and its y > -1), so rows of different
    lengths simply join the walk at their own x = len-1;
  * the only emission is one int32 per (row, x): y_at << 2 | move,
    written at a STATIC lane of the [1, BR, 16] output block — no
    scatter, no dynamic store, no while_loop.

A small jitted XLA post-pass (_moves_to_outputs) rebuilds the realigned
rows from the per-x move stream: the gap 4-fill is a dense range
compare (every column in (y_final, y_high] is consumed exactly once —
the same invariant the replay used), diagonal placements are one
L-lane scatter with ELEMENTWISE sequence values (the walk consumes seq
back-to-front, so no gather), and the insert lists are one L-lane
packed scatter ordered by the walk's discovery order (descending x).

Outputs are bit-identical to banded_realign.entry_and_backtrack
(packed path) — asserted by tests/test_pallas_backtrack.py on the
interpreter and by scripts/tpu_checks.py on silicon.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_realign import BIG, MAX_INSERTS, entry_scan

# Rows per program. The per-sub-step work is ~12 vector ops over
# [BR, WC] with a serial dependence only through the [BR, 1] y state,
# so BR is pure ILP: total element-ops are BR-independent while the
# number of (latency-bound) sub-steps scales as rows/BR. 32 measured
# best on v5e (16/32/64 within 5%; 8 ~1.4x slower).
BT_BR = 32


def _kernel(w2, t, nw, wayin_ref, aint_ref, len_ref, codes_ref,
            moves_ref, y_state):
    wi = pl.program_id(1)
    x_base = (nw - 1 - wi) * 16

    @pl.when(wi == 0)
    def _():
        y_state[:, :] = wayin_ref[:, :]

    br = y_state.shape[0]
    # this cell's window start: one masked lane-reduce over [BR, NC]
    nc = aint_ref.shape[1]
    ci = x_base // t
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (br, nc), 1)
    a = jnp.sum(jnp.where(lane_nc == ci, aint_ref[:, :], 0),
                axis=1, keepdims=True)                  # [BR, 1]

    word = codes_ref[0, :, :]                           # [BR, WC]
    iota = jax.lax.broadcasted_iota(jnp.int32, (br, w2), 1)
    lengths = len_ref[:, :]                             # [BR, 1]

    y = y_state[:, :]
    emits = []
    for xi in range(15, -1, -1):
        x = x_base + xi
        active = (x < lengths) & (y > -1)
        j = y - a
        code_x = (word >> (2 * xi)) & 3
        # gap run + x-move in one reduce: the largest candidate lane
        # <= j with a nonzero code is where the serial walk's gap run
        # ends and its x-move fires; lanes above the window (j >= w2)
        # are the forced band-jump gaps and are never candidates
        cand = (code_x != 0) & (iota <= j) & active
        pm = jnp.max(jnp.where(cand, (iota << 2) | code_x, -1),
                     axis=1, keepdims=True)             # [BR, 1]
        found = pm >= 0
        y_at = a + (pm >> 2)
        mv = pm & 3                                     # 1 diag, 2 ins
        emits.append(jnp.where(
            active, jnp.where(found, (y_at << 2) | mv, -1), -1))
        y = jnp.where(active,
                      jnp.where(found,
                                jnp.where(mv == 2, y_at, y_at - 1),
                                -1),
                      y)
    y_state[:, :] = y
    # walk order is x descending; emit lanes are x ascending
    moves_ref[0, :, :] = jnp.concatenate(emits[::-1], axis=1)


@functools.partial(jax.jit, static_argnames=("w2", "chunk",
                                              "interpret"))
def _backtrack_moves(codes, wayin, aint, lengths, *, w2, chunk,
                     interpret=False):
    """Run the walk kernel: codes [NW, B, WC] packed time-major int32
    -> moves [NW, B, 16] int32 (y_at << 2 | move; -1 = no move)."""
    nw, b, wc = codes.shape
    assert wc == w2
    br = next(v for v in (BT_BR, 16, 8, 4, 2, 1) if b % v == 0)

    def bs(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, w2, chunk, nw),
        grid=(b // br, nw),
        in_specs=[
            bs((br, 1), lambda bg, wi: (bg, 0)),              # wayin
            bs((br, aint.shape[1]), lambda bg, wi: (bg, 0)),  # aint
            bs((br, 1), lambda bg, wi: (bg, 0)),              # lengths
            bs((1, br, wc), lambda bg, wi: (nw - 1 - wi, bg, 0)),
        ],
        out_specs=bs((1, br, 16), lambda bg, wi: (nw - 1 - wi, bg, 0)),
        out_shape=jax.ShapeDtypeStruct((nw, b, 16), jnp.int32),
        scratch_shapes=[pltpu.VMEM((br, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(wayin.reshape(b, 1), aint, lengths.reshape(b, 1), codes)


_entry_scan = jax.jit(entry_scan,
                      static_argnames=("cpad", "bandwidth"))


@functools.partial(jax.jit, static_argnames=("cpad",))
def _moves_to_outputs(moves, seqs, lengths, best, *, cpad):
    """Vectorized reconstruction of (new_rows, best, iy, ib, inn) from
    the per-x move stream. All heavy ops are [B, Lpad]-lane scatters /
    elementwise — no trip-padded lanes, no gathers of seq values."""
    nw, b, _ = moves.shape
    lpad = nw * 16
    m = jnp.transpose(moves, (1, 0, 2)).reshape(b, lpad)
    xs = jnp.arange(lpad, dtype=jnp.int32)[None, :]
    valid = (xs < lengths[:, None]) & (m >= 0)
    y_at = m >> 2
    code = m & 3
    diag = valid & (code == 1)
    ins = valid & (code == 2)
    # a valid x with no move record means the walk died there (y hit
    # -1 mid-run): every column below was consumed
    dead = jnp.any((xs < lengths[:, None]) & (m < 0), axis=1)
    # final y: y after the last executed move (y_at - 1 for diagonals,
    # unchanged for inserts); monotone along the walk, so a min
    y_after = jnp.where(valid, y_at - (code == 1), BIG)
    y_fin = jnp.where(dead, -1, jnp.min(y_after, axis=1))
    y_fin = jnp.where(lengths > 0, y_fin, -1)
    # highest written column: the first x-move's column (the trailing
    # gap run above it is at x = len-1 and writes nothing)
    m_last = jnp.take_along_axis(
        m, jnp.maximum(lengths[:, None] - 1, 0), axis=1)[:, 0]
    yh = jnp.where((lengths > 0) & (m_last >= 0), m_last >> 2, -1)

    bidx = jnp.arange(b)
    ycols = jnp.arange(cpad, dtype=jnp.int32)[None, :]
    out = jnp.where((ycols > y_fin[:, None]) & (ycols <= yh[:, None]),
                    jnp.int8(4), jnp.int8(5))
    out = out.at[bidx[:, None],
                 jnp.where(diag, y_at, cpad)].set(
        seqs.astype(jnp.int8), mode="drop")

    # insert lists in discovery (descending-x) order: the insert at
    # lane x gets slot = number of inserts at lanes > x
    o = jnp.cumsum(ins[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
    inn = o[:, 0]
    slot = jnp.clip(o - 1, 0, MAX_INSERTS - 1)
    iyb = jnp.zeros((b, MAX_INSERTS), jnp.int32)
    iyb = iyb.at[bidx[:, None],
                 jnp.where(ins, slot, MAX_INSERTS)].set(
        (y_at << 2) | seqs.astype(jnp.int32), mode="drop")
    return out, best, iyb >> 2, (iyb & 3).astype(jnp.int8), inn


def entry_and_backtrack_pallas(codes, final_band, final_anf, seqs,
                               anf_full, entry_bound, lengths, ncols,
                               *, cpad, bandwidth, chunk,
                               interpret=False):
    """Drop-in for banded_realign.entry_and_backtrack on the packed
    time-major staircase path (bit-identical outputs, tested).

    codes: [Lpad/16, B, W2] int32 packed (pallas_realign packed=True);
    bandwidth: the code row width W2 = band + widen*chunk; anf_full:
    the staircase per-position window starts (constant per chunk)."""
    w2 = bandwidth
    b, l = seqs.shape
    wayin, best = _entry_scan(final_band, final_anf, entry_bound,
                              ncols, cpad=cpad, bandwidth=w2)
    aint = anf_full[:, ::chunk]
    nw = codes.shape[0]
    lpad = nw * 16
    if lpad != l:
        assert lpad > l
        seqs = jnp.pad(jnp.asarray(seqs), ((0, 0), (0, lpad - l)))
    moves = _backtrack_moves(codes, wayin, jnp.asarray(aint),
                             jnp.asarray(lengths), w2=w2, chunk=chunk,
                             interpret=interpret)
    return _moves_to_outputs(moves, seqs, jnp.asarray(lengths), best,
                             cpad=cpad)
