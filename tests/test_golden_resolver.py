"""Golden parity of the clustering engine vs the compiled reference
RepeatResolver on the planted-correlation MSA (full window)."""
import os
import subprocess

import numpy as np
import pytest

from repeatresolver_tpu.config import MaxCorrConfig, ResolverConfig
from repeatresolver_tpu.models import maxcorr, resolver
from repeatresolver_tpu.utils import io as rio

# reuse the planted MSA fixture
from tests.test_golden_maxcorr import planted_msa  # noqa: F401


@pytest.fixture(scope="module")
def resolved_c(reference_bins, planted_msa):  # noqa: F811
    d, path, msa = planted_msa
    # MaxCorrs must exist first (RepeatResolver loads, never recomputes).
    subprocess.run(
        [str(reference_bins / "MaxCorrelation"), "MSAreal_x",
         "-c", "20", "-p", "1"],
        cwd=d, check=True, capture_output=True)
    w = msa.shape[1]
    subprocess.run(
        [str(reference_bins / "RepeatResolver"), "MSAreal_x",
         "-c", "20", "-f", "0", str(w - 1)],
        cwd=d, check=True, capture_output=True)
    return d, msa, w


def test_resolver_golden(resolved_c):
    d, msa, w = resolved_c
    mc = rio.read_maxcorrs(os.path.join(d, "MaxCorrsOf_MSAreal_x"))
    cfg = ResolverConfig(cov=20)
    out = resolver.resolve_window(msa, mc, 0, w - 1, cfg)
    for kind in ("Dropoff", "RelDrop", "Kmeans"):
        c_file = os.path.join(
            d, f"{kind}SubdivisionOf_0_{w - 1}_MSAreal_x")
        c_vals = rio.read_ints(c_file)
        np.testing.assert_array_equal(out[kind], c_vals,
                                      err_msg=kind)


def test_resolver_recovers_planted_groups(resolved_c):
    d, msa, w = resolved_c
    mc = rio.read_maxcorrs(os.path.join(d, "MaxCorrsOf_MSAreal_x"))
    # interior window: the ragged row ends leave few rows covering the
    # full [0, w-1] range (both-ends rule, faithfully reproduced)
    out = resolver.resolve_window(msa, mc, 25, w - 26,
                                  ResolverConfig(cov=20))
    truth = np.arange(msa.shape[0]) % 2
    u = out["Dropoff"]
    kept = u > -1
    # the two planted copy groups must be separated cleanly
    assert kept.sum() > 40
    for g in np.unique(u[kept]):
        members_truth = truth[kept][u[kept] == g]
        assert (members_truth == members_truth[0]).mean() > 0.95


def test_probability_chain_identity():
    # identical clusterings chain to (near-)identity
    u = np.array([0, 0, 1, 1, 2, 2, -1])
    m = resolver.probability_chain([u, u, u])
    np.testing.assert_allclose(m, np.eye(3))
    bf = resolver.back_and_forth([u, u, u])
    np.testing.assert_allclose(bf, np.eye(3))


def test_batched_refinement_matches_lazy_cliquer():
    # group_refinement's chunked-matmul seed statistics must reproduce
    # the per-seed cliquer() exactly (same stats -> same TheBestUpdater
    # trajectory), including seeds processed across chunk boundaries.
    rng = np.random.default_rng(5)
    cons = rng.integers(0, 4, 40).astype(np.int8)
    sig = np.tile(cons, (60, 1))
    # two planted copy groups deviating at disjoint column sets
    dev = rng.choice(40, 16, replace=False)
    sig[:30, dev[:8]] = (sig[:30, dev[:8]] + 1) % 4
    sig[30:, dev[8:]] = (sig[30:, dev[8:]] + 1) % 4
    sig[rng.random(sig.shape) < 0.05] = 5
    win = resolver.Window(sig, np.ones(60, np.int8), 0, 39)
    gd = resolver.GroupData.from_window(win)
    mc = rng.random(40 * 5) * 10
    ref = resolver.group_refinement(gd, mc, cutoff=4.0, mincov=8,
                                    maxclique=6, greedy=4.0,
                                    seed_chunk=7)
    compared = 0
    for seed in np.nonzero(mc > 4.0)[0]:
        if seed in ref.cliques:
            lazy = resolver.cliquer(gd, 8, 6, 4.0, int(seed))
            assert ref.cliques[seed] == lazy, seed
            compared += 1
    assert compared >= 10
