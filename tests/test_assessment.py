import numpy as np

from repeatresolver_tpu.models import assessment as am


def test_resolution_quality_perfect():
    gt = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    res = np.array([2, 2, 2, 0, 0, 0, 1, 1, 1])  # relabeled but perfect
    q = am.resolution_quality(gt, res)
    assert q.truepositives == 3
    assert q.falsepositives == 0
    assert q.conconfpositives[9] == 3  # full confidence


def test_resolution_quality_with_unresolved_rows():
    gt = np.array([0, 0, 1, 1, 2, 2])
    res = np.array([0, 0, 1, 1, -1, -1])  # group 2 not resolved
    q = am.resolution_quality(gt, res)
    assert q.truepositives == 2
    assert q.falsepositives == 0


def test_resolution_quality_merged_groups():
    gt = np.array([0, 0, 0, 1, 1, 1])
    res = np.zeros(6, np.int64)  # everything in one cluster
    q = am.resolution_quality(gt, res)
    # a single merged cluster cannot mutually-best-match both groups
    assert q.truepositives <= 1


def test_multi_step_resolution_chain():
    # two windows, consistent clustering; flanks carry the copy id
    gt = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    w1 = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    w2 = np.array([1, 1, 1, 2, 2, 2, 0, 0, 0])
    left = gt.copy()
    right = gt.copy()
    concon, q = am.multi_step_resolution(left, [w1, w2], right)
    assert q.truepositives == 3
    assert q.falsepositives == 0
    np.testing.assert_allclose(concon, np.eye(3))


def test_flanking_and_ground_truth(tmp_path):
    import os

    from repeatresolver_tpu.utils import io as rio
    # 2 reads, each cut into [flank, repeat, flank] -> seqs 0..5;
    # repeat seqs are 1 and 4.
    rio.write_ints(tmp_path / "X_ReadCopynumbers", [3, 7])
    rio.write_ints(tmp_path / "X_ReadPlacements", [0, 100])
    rio.write_readseqinfo(tmp_path / "X_ReadSeqInfo", [3, 3])
    with open(tmp_path / "X_SeqClass", "w") as f:
        f.write("l\nr\nl\nl\nr\nl\n")
    ds = am.SimDataset.load(str(tmp_path))
    np.testing.assert_array_equal(ds.msa2seq, [1, 4])
    np.testing.assert_array_equal(ds.ground_truth_resolution(), [3, 7])
    left, right = ds.flanking()
    np.testing.assert_array_equal(left, [3, 7])
    np.testing.assert_array_equal(right, [3, 7])


def test_resolvability_separable_groups():
    rng = np.random.default_rng(0)
    cons = rng.integers(0, 4, 30)
    sigs = np.tile(cons, (20, 1)).astype(np.int8)
    gt = np.repeat([0, 1], 10)
    # group 1 differs at 4 columns
    sigs[10:, [2, 9, 17, 25]] = (sigs[10:, [2, 9, 17, 25]] + 1) % 4
    mind, summe = am.resolvability(gt, sigs)
    # separable when demanding <=3 differences, not at >=4
    assert summe[3] == 2
    assert summe[4] == 0


def test_half_resolvability():
    rng = np.random.default_rng(1)
    cons = rng.integers(0, 4, 40)
    sigs = np.tile(cons, (20, 1)).astype(np.int8)
    gt = np.repeat([0, 1], 10)
    # 6 differences in the first half only -> separable (>5) on half 1,
    # not on half 2 (TransposonAssessment.py:143-150 bucket logic)
    sigs[10:, [1, 4, 7, 11, 14, 18]] = \
        (sigs[10:, [1, 4, 7, 11, 14, 18]] + 1) % 4
    md1, md2, hc = am.half_resolvability(gt, sigs)
    assert md1.tolist() == [6, 6] and md2.tolist() == [0, 0]
    assert hc == {"biggerbigger": 0, "biggersmaller": 2,
                  "smallerbigger": 0, "smallersmaller": 0}


def test_window_boundaries():
    from repeatresolver_tpu.config import WindowConfig
    from repeatresolver_tpu.models.window import window_boundaries
    msa = np.zeros((10, 1000), np.int8)
    msa[:, :100] = 5
    msa[:5, 100:200] = 5          # half coverage early
    bounds = window_boundaries(msa, WindowConfig(parts=4))
    assert bounds[0] == 200       # trimmed the low-coverage start
    assert bounds[-1] == 900
    assert len(bounds) == 5
