"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from repeatresolver_tpu.parallel import sharded


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual mesh")
def test_dryrun_8_devices():
    sharded.dryrun(8)


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs >= 4 devices")
def test_sharded_realign_counts_consistent():
    """The psum'd histogram delta must equal a from-scratch recount of
    the rewritten rows."""
    mesh = sharded.make_mesh(4)
    rng = np.random.default_rng(1)
    r, c, l, w = 8, 512, 256, 128
    msa = np.full((r, c), 5, np.int8)
    for k in range(r):
        seg = rng.integers(0, 4, c - 60).astype(np.int8)
        gaps = rng.random(c - 60) < 0.1
        seg[gaps] = 4
        msa[k, 30:c - 30] = seg
    counts = np.zeros((c, 6), np.int32)
    for s in range(6):
        counts[:, s] = (msa == s).sum(axis=0)
    lengths = np.zeros(r, np.int32)
    seqs = np.zeros((r, l), np.int8)
    ways = np.zeros((r, l), np.int32)
    for k in range(r):
        pos = np.nonzero(msa[k] < 4)[0][:l]
        lengths[k] = len(pos)
        seqs[k, :len(pos)] = msa[k][pos]
        ways[k, :len(pos)] = pos
        ways[k, len(pos):] = pos[-1]
    step = sharded.sharded_realign_step(mesh, ncols=c, bandwidth=w)
    new_rows, new_counts, best = step(counts, msa, seqs, ways, lengths)
    new_rows = np.asarray(new_rows)
    new_counts = np.asarray(new_counts)
    expect = counts.copy()
    for s in range(6):
        expect[:, s] += ((new_rows == s).sum(axis=0)
                         - (msa == s).sum(axis=0))
    np.testing.assert_array_equal(new_counts, expect)
