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
