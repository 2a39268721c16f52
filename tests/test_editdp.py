import numpy as np

from repeatresolver_tpu.ops import editdp


def naive_dp(q, t):
    """Literal port of the reference recurrence + move codes
    (InitialAligner.c:294-324)."""
    lq, lt = len(q), len(t)
    M = np.zeros((lq + 1, lt + 1), np.int64)  # shifted by +1,+1
    M[0, :] = 0
    M[:, 0] = np.arange(lq + 1)
    codes = np.zeros((lq, lt), np.int8)
    for x in range(lq):
        for y in range(lt):
            m = int(q[x] != t[y])
            e = M[x, y] + m
            c = 0 if m else 3
            if M[x + 1, y] + 1 < e:
                e = M[x + 1, y] + 1
                c = 1
            if M[x, y + 1] + 1 < e:
                e = M[x, y + 1] + 1
                c = 2
            M[x + 1, y + 1] = e
            codes[x, y] = c
    return M[1:, 1:], codes


def rand_case(rng, lq, lt):
    return (rng.integers(0, 4, lq).astype(np.int16),
            rng.integers(0, 4, lt).astype(np.int16))


def test_last_rows_matches_naive():
    rng = np.random.default_rng(0)
    qs, ts, lens = [], [], []
    lt = 37
    for lq in (1, 5, 20, 33):
        q, t = rand_case(rng, lq, lt)
        qs.append(q)
        ts.append(t)
        lens.append(lq)
    lqmax = max(lens)
    qpad = np.full((len(qs), lqmax), 100, np.int16)
    for i, q in enumerate(qs):
        qpad[i, :len(q)] = q
    fr = np.asarray(editdp.last_rows(
        qpad, np.array(lens, np.int32), np.stack(ts)))
    for i, (q, t) in enumerate(zip(qs, ts)):
        M, _ = naive_dp(q, t)
        np.testing.assert_array_equal(fr[i], M[-1])


def test_align_with_codes_matches_naive():
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 41).astype(np.int16)
    lens = [7, 19, 30]
    qpad = np.full((3, 30), 100, np.int16)
    qs = []
    for i, lq in enumerate(lens):
        q = rng.integers(0, 4, lq).astype(np.int16)
        qs.append(q)
        qpad[i, :lq] = q
    codes, fr = editdp.align_with_codes(
        qpad, np.array(lens, np.int32), t)
    codes, fr = np.asarray(codes), np.asarray(fr)
    for i, q in enumerate(qs):
        M, ref_codes = naive_dp(q, t)
        np.testing.assert_array_equal(codes[i, :len(q)], ref_codes)
        np.testing.assert_array_equal(fr[i], M[-1])


def test_entry_column_tie_breaks_to_largest():
    fr = np.array([0, 5, 3, 3, 7])
    assert editdp.entry_column(fr) == 3  # col 0 ignored, tie -> largest
    fr2 = np.array([9, 4, 4, 4, 4])
    assert editdp.entry_column(fr2) == 4


def test_backtrack_simple_identity():
    # query == target -> all diagonal, alignment i -> i.
    t = np.array([0, 1, 2, 3, 0, 1], np.int16)
    q = t.copy()
    codes, fr = editdp.align_with_codes(
        q[None, :], np.array([6], np.int32), t)
    entry = editdp.entry_column(np.asarray(fr)[0])
    out = editdp.backtrack_batch(np.asarray(codes),
                                 np.array([6]), np.array([entry]))
    np.testing.assert_array_equal(out[0], np.arange(6))


def test_backtrack_with_insertion():
    # query has an extra base vs target: one 'd' (-1) somewhere.
    t = np.array([0, 1, 2, 3], np.int16)
    q = np.array([0, 1, 3, 2, 3], np.int16)
    codes, fr = editdp.align_with_codes(
        q[None, :], np.array([5], np.int32), t)
    entry = editdp.entry_column(np.asarray(fr)[0])
    out = editdp.backtrack_batch(np.asarray(codes),
                                 np.array([5]), np.array([entry]))[0]
    assert (out == -1).sum() == 1
    placed = out[out >= 0]
    assert (np.diff(placed) > 0).all()


def test_align_on_device_matches_host_backtrack():
    rng = np.random.default_rng(9)
    t = rng.integers(0, 4, 55).astype(np.int16)
    lens = [12, 30, 47]
    qpad = np.full((3, 47), 100, np.int16)
    for i, lq in enumerate(lens):
        q = t[(5 + i):(5 + i + lq)].copy()
        mut = rng.random(lq) < 0.15
        q[mut] = rng.integers(0, 4, mut.sum())
        qpad[i, :lq] = q
    qlens = np.array(lens, np.int32)
    aligned_dev, fr_dev = editdp.align_on_device(qpad, qlens, t)
    codes, fr = editdp.align_with_codes(qpad, qlens, t)
    entries = np.array([editdp.entry_column(np.asarray(fr)[r])
                        for r in range(3)])
    aligned_host = editdp.backtrack_batch(np.asarray(codes), qlens,
                                          entries)
    np.testing.assert_array_equal(np.asarray(fr_dev), np.asarray(fr))
    for r, lq in enumerate(lens):
        np.testing.assert_array_equal(
            np.asarray(aligned_dev)[r, :lq], aligned_host[r, :lq])
