"""Golden parity of MaxCorrs vs the compiled reference MaxCorrelation
(linked against our GSL shim) on a synthetic MSA with planted
correlations."""
import os
import subprocess

import numpy as np
import pytest

from repeatresolver_tpu.config import MaxCorrConfig
from repeatresolver_tpu.models import maxcorr
from repeatresolver_tpu.utils import io as rio


@pytest.fixture(scope="module")
def planted_msa(tmp_path_factory):
    """60 rows over 2 copy groups; group-distinguishing SNP columns
    well over 20 apart, plus noise, gaps, and ragged coverage."""
    rng = np.random.default_rng(5)
    rows, cols = 60, 400
    consensus = rng.integers(0, 4, cols)
    msa = np.tile(consensus, (rows, 1)).astype(np.int8)
    group = np.arange(rows) % 2
    snp_cols = [50, 90, 140, 200, 260, 330]
    for cc in snp_cols:
        alt = (consensus[cc] + 1) % 4
        msa[group == 1, cc] = alt
    noise = rng.random((rows, cols)) < 0.02
    msa[noise] = rng.integers(0, 4, noise.sum())
    gaps = rng.random((rows, cols)) < 0.03
    msa[gaps] = 4
    # ragged coverage at the ends
    for rr in range(rows):
        lo = rng.integers(0, 25)
        hi = cols - rng.integers(0, 25)
        msa[rr, :lo] = 5
        msa[rr, hi:] = 5
    d = tmp_path_factory.mktemp("mcmsa")
    path = os.path.join(d, "MSAreal_x")
    rio.write_msa(path, msa, upper=True)
    return str(d), path, msa


def test_maxcorrs_golden(reference_bins, planted_msa):
    d, path, msa = planted_msa
    subprocess.run(
        [str(reference_bins / "MaxCorrelation"), "MSAreal_x",
         "-c", "20", "-p", "1"],
        cwd=d, check=True, capture_output=True)
    c_vals = rio.read_maxcorrs(os.path.join(d, "MaxCorrsOf_MSAreal_x"))

    mine = maxcorr.compute_maxcorrs(msa, MaxCorrConfig(mincov=20))
    assert mine.shape == c_vals.shape
    # %f prints 6 decimals; assert well within that.
    np.testing.assert_allclose(mine, c_vals, atol=2e-6)
    # sanity: the planted SNP columns carry big significance
    col_max = mine.reshape(-1, 5).max(axis=1)
    assert (col_max[[50, 90, 140, 200, 260, 330]] > 10).all()


def test_maxcorrs_tiling_invariance(planted_msa):
    _, _, msa = planted_msa
    a = maxcorr.compute_maxcorrs(msa, MaxCorrConfig(mincov=20), tile=64)
    b = maxcorr.compute_maxcorrs(msa, MaxCorrConfig(mincov=20), tile=512)
    np.testing.assert_array_equal(a, b)


def test_device_path_matches_host(planted_msa):
    from repeatresolver_tpu.models.maxcorr import (compute_maxcorrs,
                                                   compute_maxcorrs_device)
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    host = compute_maxcorrs(msa, cfg)
    dev = compute_maxcorrs_device(msa, cfg, tile=128)
    cutoff = cfg.resolved_cutoff(msa.shape[1])
    # identical significance decisions...
    np.testing.assert_array_equal(host > cutoff, dev > cutoff)
    # ...and close values where significant (f32 + truncated series)
    sig = host > cutoff
    np.testing.assert_allclose(dev[sig], host[sig], rtol=2e-3, atol=5e-3)


def test_fast_path_decisions_match_exact(planted_msa):
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    exact = maxcorr.compute_maxcorrs(msa, cfg)
    fast = maxcorr.compute_maxcorrs(msa, cfg, fast=True)
    cutoff = cfg.resolved_cutoff(msa.shape[1])
    np.testing.assert_array_equal(exact > cutoff, fast > cutoff)
    sig = exact > cutoff
    np.testing.assert_allclose(fast[sig], exact[sig], atol=2e-6)


def test_fork_workers_match_serial(planted_msa):
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    serial = maxcorr.compute_maxcorrs(msa, cfg, tile=64)
    forked = maxcorr.compute_maxcorrs(msa, cfg, tile=64, threads=3)
    np.testing.assert_array_equal(serial, forked)


def _native_or_skip():
    from repeatresolver_tpu.utils import native
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "maxcorr_scan"):
        pytest.skip("native lib unavailable")


@pytest.mark.parametrize("fast", [False, True])
def test_native_scan_matches_numpy(planted_msa, fast):
    """Banded-bitset C++ scan (native/host_ops.cpp maxcorr_scan) value-
    parity with the numpy tile scan. The numpy path rounds Z through a
    float32 tile before the max; native keeps float64 — hence the 1e-4
    tolerance on values with exact cutoff decisions."""
    _native_or_skip()
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    ref = maxcorr.compute_maxcorrs(msa, cfg, fast=fast, native="never")
    nat = maxcorr.compute_maxcorrs_native(msa, cfg, fast=fast,
                                          threads=2, progress=False)
    np.testing.assert_allclose(nat, ref, atol=1e-4)
    cutoff = cfg.resolved_cutoff(msa.shape[1])
    np.testing.assert_array_equal(ref > cutoff, nat > cutoff)


def test_native_dispatch_from_compute_maxcorrs(planted_msa):
    """native="always" routes through the C++ kernel and agrees with
    the default numpy path from the same public entry point."""
    _native_or_skip()
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    a = maxcorr.compute_maxcorrs(msa, cfg, fast=True, native="never")
    b = maxcorr.compute_maxcorrs(msa, cfg, fast=True, native="always")
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_native_checkpoint_resume(planted_msa, tmp_path):
    """An interrupted chunked scan resumes from its checkpoint and
    produces the one-shot result (paper-scale restartability)."""
    _native_or_skip()
    from repeatresolver_tpu.utils import native
    from repeatresolver_tpu.utils.checkpoint import _atomic_write
    _, _, msa = planted_msa
    cfg = MaxCorrConfig(mincov=20)
    oneshot = maxcorr.compute_maxcorrs_native(msa, cfg, fast=True,
                                              threads=2, progress=False)
    r, c = msa.shape
    # build a genuine partial state: scan only the first 150 seed
    # columns, checkpoint it as "next=150", then resume.
    bits = native.MaxCorrBitsets(msa)
    part = np.zeros(c * 5, np.float64)
    bits.scan(part, 0, 150, cfg.mincov, cfg.min_col_gap, r,
              cfg.majority_filter, True, 2)
    ckpt = str(tmp_path / "mc.npz")

    def w(f):
        np.savez(f, maxcorrs=part, next=150, c=c, r=r, fast=True)
    _atomic_write(ckpt, w)
    resumed = maxcorr.compute_maxcorrs_native(
        msa, cfg, fast=True, threads=2, chunk=100,
        checkpoint_path=ckpt, progress=False)
    np.testing.assert_allclose(resumed, oneshot, atol=1e-12)
    # stale checkpoint (different shape) is ignored, not mis-resumed
    def w2(f):
        np.savez(f, maxcorrs=part[:5], next=150, c=1, r=r, fast=True)
    _atomic_write(ckpt, w2)
    fresh = maxcorr.compute_maxcorrs_native(
        msa, cfg, fast=True, threads=2, checkpoint_path=ckpt,
        progress=False)
    np.testing.assert_allclose(fresh, oneshot, atol=1e-12)
