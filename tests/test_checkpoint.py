import os

import numpy as np

from repeatresolver_tpu.config import RealignerConfig
from repeatresolver_tpu.models import realigner
from repeatresolver_tpu.utils import checkpoint as ckpt
from tests.test_batched_realigner import make_msa


def test_checkpoint_roundtrip(tmp_path):
    msa = make_msa(1)
    p = str(tmp_path / "ck.npz")
    c = ckpt.RealignCheckpoint(msa=msa, round=3, best_mille=1,
                               best_uno=234, bandwidth=96)
    c.save(p)
    c2 = ckpt.RealignCheckpoint.load(p)
    np.testing.assert_array_equal(c.msa, c2.msa)
    assert (c2.round, c2.best_mille, c2.best_uno, c2.bandwidth) == \
        (3, 1, 234, 96)


def test_checkpoint_engine_state_roundtrip(tmp_path):
    """The optional engine-state fields (anneal position + learned
    drift ladder) survive a save/load; legacy checkpoints without them
    load with zeros/None."""
    msa = make_msa(1)
    p = str(tmp_path / "ck2.npz")
    widen = np.array([2, 3, 12], np.int32)
    exact = np.array([1], np.int64)
    c = ckpt.RealignCheckpoint(msa=msa, round=4, best_mille=0,
                               best_uno=99, bandwidth=96,
                               block_rows=8, widen_bs=8, widen=widen,
                               exact_blocks=exact)
    c.save(p)
    c2 = ckpt.RealignCheckpoint.load(p)
    assert (c2.block_rows, c2.widen_bs) == (8, 8)
    np.testing.assert_array_equal(c2.widen, widen)
    np.testing.assert_array_equal(c2.exact_blocks, exact)
    # without engine state: fields default
    c3 = ckpt.RealignCheckpoint(msa=msa, round=1, best_mille=0,
                                best_uno=5, bandwidth=96)
    c3.save(p)
    c4 = ckpt.RealignCheckpoint.load(p)
    assert c4.block_rows == 0 and c4.widen is None


def test_realign_resume_matches_fresh(tmp_path):
    msa = make_msa(5)
    cfg = RealignerConfig(bandwidth=96)
    ckp = str(tmp_path / "re.npz")
    stats = {}
    log = []
    out = realigner.realign_batched(msa.copy(), cfg, score_log=log,
                                    block_rows=2, checkpoint_path=ckp,
                                    stats=stats, validate=True)
    assert os.path.exists(ckp)
    assert stats["rounds"] >= 1 and stats["dp_cells"] > 0
    # resume from the final checkpoint: already converged state, so one
    # more sweep must not find an improvement and must return the same
    # best MSA.
    log2 = []
    out2 = realigner.realign_batched(msa.copy(), cfg, score_log=log2,
                                     block_rows=2, checkpoint_path=ckp,
                                     resume=True)
    np.testing.assert_array_equal(out, out2)


def test_cached_compute_once(tmp_path):
    calls = []
    p = str(tmp_path / "v.npy")

    def compute():
        calls.append(1)
        return np.arange(5)

    def save(path, v):
        np.save(path, v)

    def load(path):
        return np.load(path)

    a = ckpt.cached(p, compute, save, load)
    b = ckpt.cached(p, compute, save, load)
    np.testing.assert_array_equal(a, b)
    assert len(calls) == 1
