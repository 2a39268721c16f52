import numpy as np

from repeatresolver_tpu.ops import editdp, myers


def test_myers_matches_editdp_last_rows():
    rng = np.random.default_rng(3)
    pattern = rng.integers(0, 4, 40).astype(np.int16)
    texts = rng.integers(0, 4, (5, 200)).astype(np.int16)
    # plant a near-exact occurrence
    texts[2, 60:100] = pattern
    ref = np.asarray(editdp.last_rows(
        np.broadcast_to(pattern[None, :], (5, 40)),
        np.full(5, 40, np.int32), texts))
    got = myers.last_rows_batch(pattern, texts)
    np.testing.assert_array_equal(got, ref)
    single = myers.last_row(pattern, texts[2])
    np.testing.assert_array_equal(single, ref[2])
    assert ref[2, 60:100].min() <= 1


def test_gradient_copies():
    from repeatresolver_tpu.models import simulator as sim
    rng = np.random.default_rng(0)
    seq = sim.random_sequence(rng, 1000)
    copies = sim.gradient_copies(rng, seq, 5, 0.02)
    assert len(copies) == 5
    np.testing.assert_array_equal(copies[0], seq)
    # increasing divergence from the template along the chain
    k = 300
    d = [(c[:k] != seq[:k]).mean() for c in copies]
    assert d[1] < d[-1] + 1e-9 and d[-1] > 0
