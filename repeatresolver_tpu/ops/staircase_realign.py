"""Staircase-band realignment fill — the production turbo mode.

The reference band is re-centered at every sequence position
(PW_ReAligner.c:1496), which forces per-step windowed reads of the cost
arrays. This variant holds the band window CONSTANT across a chunk of T
positions and widens it to W2 = W + T, so the window still covers every
position's reference band whenever the row's column path advances at
most ~1 column per base (the typical case — coverage-gap jumps just
re-center at the next chunk):

  * one window gather per chunk instead of per step;
  * within a chunk the previous-row band reads are STATIC shifts;
  * the off-band jump rule is needed only at chunk boundaries.

This changes which cells are explored (a valid, slightly different
band) so trajectories differ from the reference; the realigner's
best-checkpoint convergence contract is unchanged. The exact engine
remains the parity oracle.

Both an XLA implementation and a Pallas TPU kernel are provided; they
produce identical codes (tested, Pallas in interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .banded_realign import BIG, _row_costs


def staircase_anf(ways: np.ndarray, lengths: np.ndarray, bandwidth: int,
                  chunk: int, ncols: int) -> np.ndarray:
    """Per-position band starts: constant within each chunk, taken from
    the reference band start of the chunk's first position."""
    b, l = ways.shape
    bh = bandwidth // 2
    nchunks = -(-l // chunk)
    anf = np.maximum(0, np.asarray(ways, np.int64) - bh)
    a = anf[:, ::chunk][:, :nchunks]                   # [B, NC]
    return np.repeat(a, chunk, axis=1)[:, :l].astype(np.int32)


@functools.partial(jax.jit,
                   static_argnames=("bandwidth", "chunk", "widen"))
def staircase_fill(counts, rows_old, seqs, ways, lengths, ncols, *,
                   bandwidth, chunk=256, widen=1):
    """XLA staircase fill. bandwidth here is the reference W; the
    effective window is W2 = W + widen*chunk — the window covers every
    position's reference band as long as the column path drifts at most
    `widen` columns per base within a chunk (gap-dense early-round MSAs
    need widen 2-4; compacted ones 1 — BatchedRealigner measures the
    actual drift per block). Returns (codes uint8 [B, L, W2],
    final_band int32 [B, W2], final_anf int32 [B])."""
    w = bandwidth
    t = chunk
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
    gapp = jnp.pad(gapcost.astype(jnp.int32), ((0, 0), (0, pad)))
    insp = jnp.pad(inscost.astype(jnp.int32), ((0, 0), (0, pad)))
    nsp = jnp.pad(ns.astype(jnp.int32), ((0, 0), (0, pad)))
    gp = jnp.pad(g, ((0, 0), (0, pad)), mode="edge")
    ownp = jnp.pad(own, ((0, 0), (0, pad)), constant_values=5)
    counts4 = jnp.pad(counts.astype(jnp.int32)[:, 0:4],
                      ((0, pad), (0, 0)))              # [C+pad, 4]

    bh_arr = jnp.maximum(0, ways - bh)
    a_chunks = bh_arr[:, ::t][:, :nchunks]             # [B, NC]
    arange_w2 = jnp.arange(w2, dtype=jnp.int32)
    lob_all = bh_arr                                   # ref band starts

    def chunk_step(carry, ci):
        band, prev_a = carry                           # [B, W2], [B]
        a = a_chunks[:, ci]                            # [B]
        ysw = a[:, None] + arange_w2[None, :]          # [B, W2]

        def sl(arr):
            return jax.vmap(
                lambda r, s: jax.lax.dynamic_slice(r, (s,), (w2,)))(
                arr, a)

        gap_w = sl(gapp)
        ins_w = sl(insp)
        ns_w = sl(nsp)
        own_w = sl(ownp)
        gy1_w = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (w2,)))(
            gp, a + 1)
        c4_w = jax.vmap(
            lambda s: jax.lax.dynamic_slice(counts4, (s, 0), (w2, 4)))(
            a)                                         # [B, W2, 4]

        # chunk-boundary band shift: d >= 0, jump rule above old top
        d = jnp.clip(a - prev_a, 0, w2 + 1)
        prev_ext = jnp.concatenate(
            [band, jnp.full((b, w2 + 2), BIG, jnp.int32)], axis=1)
        shifted = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (w2,)))(
            prev_ext, d)
        jidx = arange_w2[None, :] + d[:, None]
        gtop = jax.vmap(lambda r, s: r[s])(gp, prev_a + w2)
        jump = band[:, w2 - 1:w2] + (gy1_w - gtop[:, None])
        # diagonal carry across the boundary: the exact band's diag
        # predecessor of the new window's lane 0 (col a) is col a-1 at
        # x0-1 = OLD window lane d-1, which the left-shift discards
        # (banded_realign reads it as j = iota + d - 1 every step).
        # Without it a path hugging the band bottom at a chunk
        # boundary is lost and the staircase finds a worse rewrite —
        # with it, every in-band cell equals the exact-band value, so
        # staircase trajectories are chunk- and widen-invariant and
        # bit-equal to exact mode (test_staircase_matches_exact_*).
        g0 = gy1_w[:, 0:1] - gap_w[:, 0:1]               # gp[a]
        old_dm1 = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (1,)))(
            prev_ext, jnp.clip(d - 1, 0, w2 + 1))
        bjump0 = band[:, w2 - 1:w2] + (g0 - gtop[:, None])
        bdiag = jnp.where(d[:, None] == 0, BIG,
                          jnp.where(d[:, None] - 1 >= w2, bjump0,
                                    old_dm1))
        band = jnp.where(jidx >= w2, jump, shifted)
        first_chunk = ci == 0
        band = jnp.where(first_chunk, 0, band)
        bdiag = jnp.where(first_chunk, BIG, bdiag)

        seq_c = jax.lax.dynamic_slice_in_dim(seqs, ci * t, t, axis=1)
        lob_c = jax.lax.dynamic_slice_in_dim(lob_all, ci * t, t, axis=1)
        ok_ins = (ysw > 0) & (ysw < ncols - 1)
        validc = ysw < ncols
        gy1m = gy1_w

        def step(band, tt):
            x = ci * t + tt
            s = seq_c[:, tt].astype(jnp.int32)
            # restrict candidates to position x's REFERENCE band: the
            # widened window only lets the band drift within a chunk —
            # exploring beyond [way-bh, way-bh+w) changes the optimum
            # (rows dodge each other into uncovered columns) and breaks
            # the reference's convergence behavior.
            lo = lob_c[:, tt][:, None]                 # [B, 1]
            inband = (ysw >= lo) & (ysw < lo + w)
            csel = jnp.take_along_axis(
                c4_w, s[:, None, None], axis=2)[:, :, 0]
            subcost = ns_w - (csel - (own_w == s[:, None]))
            first = x == 0
            # lane 0's diag predecessor: BIG in-chunk (col a-1 is
            # below the window), the boundary carry on the chunk's
            # first step (see bdiag above)
            lane0 = jnp.where(tt == 0, bdiag,
                              jnp.full((b, 1), BIG, jnp.int32))
            diag_prev = jnp.where(
                first, 0,
                jnp.concatenate([lane0, band[:, :-1]], axis=1))
            up_prev = jnp.where(first, 0, band)
            diag = diag_prev + subcost
            av = jnp.minimum(diag,
                             jnp.where(ok_ins, up_prev + ins_w, BIG))
            av = jnp.where(validc & inband, av, BIG)
            m = jax.lax.associative_scan(jnp.minimum, av - gy1m,
                                         axis=1) + gy1m
            left = jnp.concatenate(
                [jnp.full((b, 1), BIG, jnp.int32), m[:, :-1]], axis=1)
            is_last = (x == lengths - 1)[:, None]
            gap_hit = (m == left + gap_w) | (is_last & (m == left))
            codes = jnp.where(gap_hit, jnp.uint8(0),
                              jnp.where(m == diag, jnp.uint8(1),
                                        jnp.uint8(2)))
            active = (x < lengths)[:, None]
            return jnp.where(active, m, band), codes

        band, codes_c = jax.lax.scan(step, band,
                                     jnp.arange(t, dtype=jnp.int32))
        return (band, a), codes_c

    band0 = jnp.zeros((b, w2), jnp.int32)
    a0 = jnp.zeros((b,), jnp.int32)
    (final_band, final_a), codes = jax.lax.scan(
        chunk_step, (band0, a0), jnp.arange(nchunks, dtype=jnp.int32))
    codes = codes.reshape(lpad, b, w2)[:l]
    return (jnp.transpose(codes, (1, 0, 2)), final_band, final_a)
