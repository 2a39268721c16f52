"""Parity of the device-resident realigner with the host-orchestrated
block engine.

DeviceResidentRealigner keeps the MSA in device memory and applies
blocks, splices, and compaction on device; given the same block order
and flush points its math is the host path's math, so the per-sweep
(mille, uno) trajectory and the final MSA must be bit-equal to
BatchedRealigner(kernel="pallas", mode="staircase") — including the
fixed staircase slack (`widen`), which is drift headroom, not extra
band, and therefore result-neutral for any value covering the drift.
Runs on the CPU interpreter."""
import numpy as np

from repeatresolver_tpu.config import RealignerConfig
from repeatresolver_tpu.models import realigner


def make_msa(seed, rows=16, tlen=300, d=0.06):
    rng = np.random.default_rng(seed)
    template = rng.integers(0, 4, tlen)
    msa = np.full((rows, tlen), 5, np.int8)
    for k in range(rows):
        row = template.copy()
        muts = rng.random(tlen) < d
        row[muts] = rng.integers(0, 4, int(muts.sum()))
        gaps = rng.random(tlen) < 0.08
        row[gaps] = 4
        lo = rng.integers(0, tlen // 8)
        hi = tlen - rng.integers(0, tlen // 8)
        msa[k, lo:hi] = row[lo:hi]
    return msa


def _run_host(msa, sweeps, bs, band, chunk):
    eng = realigner.BatchedRealigner(
        msa.copy(), bandwidth=band, block_rows=bs, mode="staircase",
        chunk=chunk, kernel="pallas")
    eng.ent_al_gapper()
    log = []
    for _ in range(sweeps):
        eng.sweep()
        log.append(eng.overall_pair())
    return log, eng.msa.copy()


def _run_resident(msa, sweeps, bs, band, chunk, widen=None):
    import os

    from repeatresolver_tpu.models.realigner_device import (
        DeviceResidentRealigner,
    )
    if widen is not None:
        os.environ["RR_RESIDENT_WIDEN"] = str(widen)
    try:
        eng = DeviceResidentRealigner(
            msa.copy(), bandwidth=band, block_rows=bs,
            mode="staircase", chunk=chunk, kernel="pallas",
            interpret=True)
        eng.ent_al_gapper()
        log = []
        for _ in range(sweeps):
            eng.sweep()
            log.append(eng.overall_pair())
        eng._sync_host()
        return log, eng.msa.copy()
    finally:
        os.environ.pop("RR_RESIDENT_WIDEN", None)


def test_resident_matches_host_trajectory():
    msa = make_msa(3)
    band, chunk, bs, sweeps = 96, 32, 8, 4
    log_h, msa_h = _run_host(msa, sweeps, bs, band, chunk)
    log_d, msa_d = _run_resident(msa, sweeps, bs, band, chunk)
    assert log_h == log_d
    np.testing.assert_array_equal(msa_h, msa_d)


def test_resident_widen_is_result_neutral():
    msa = make_msa(7, rows=12, tlen=260)
    band, chunk, bs, sweeps = 96, 32, 4, 3
    base = None
    for widen in (4, 8, 12):
        log, out = _run_resident(msa, sweeps, bs, band, chunk,
                                 widen=widen)
        if base is None:
            base = (log, out)
        else:
            assert log == base[0], f"widen={widen}"
            np.testing.assert_array_equal(out, base[1])


def test_resident_exact_fallback_parity():
    """A row whose bases are spread so thin that its column-path drift
    exceeds any staircase slack must route its block through the exact
    banded fill (the host engine's own fallback) and still match the
    host trajectory."""
    msa = make_msa(5, rows=8, tlen=280)
    # plant a pathological sparse row: one base every 15 columns
    sparse = np.full(280, 5, np.int8)
    rng = np.random.default_rng(0)
    sparse[::15] = rng.integers(0, 4, len(sparse[::15]))
    msa[3] = sparse
    band, chunk, bs, sweeps = 96, 32, 4, 3
    log_h, msa_h = _run_host(msa, sweeps, bs, band, chunk)
    log_d, msa_d = _run_resident(msa, sweeps, bs, band, chunk,
                                 widen=4)
    assert log_h == log_d
    np.testing.assert_array_equal(msa_h, msa_d)


def test_resident_through_realign_batched():
    """realign_batched routes pallas+staircase to the resident engine
    (RR_RESIDENT default); the full loop — best tracking, anneal,
    final gapper — must produce a final MSA at least as good as the
    host path's and a valid count invariant."""
    import os
    msa = make_msa(11, rows=12, tlen=260)
    cfg = RealignerConfig(bandwidth=96)
    log_r: list = []
    out_r = realigner.realign_batched(
        msa.copy(), cfg, block_rows=4, mode="staircase",
        kernel="pallas", score_log=log_r)
    os.environ["RR_RESIDENT"] = "0"
    try:
        log_h: list = []
        out_h = realigner.realign_batched(
            msa.copy(), cfg, block_rows=4, mode="staircase",
            kernel="pallas", score_log=log_h)
    finally:
        os.environ.pop("RR_RESIDENT", None)
    assert log_r == log_h
    np.testing.assert_array_equal(out_r, out_h)
    realigner.validate_counts(
        out_r, realigner.symbol_counts(out_r).astype(np.int64))
