"""Native C++ host ops must match the pure-Python literal loops."""
import numpy as np
import pytest

from repeatresolver_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.fail("native build failed — g++ is expected in this image")
    return lib


def test_kmeans_parity(lib):
    from repeatresolver_tpu.models import resolver

    rng = np.random.default_rng(0)
    for trial in range(3):
        n, v = 40 + 10 * trial, 12
        varsigs = rng.random((n, v)) < 0.4
        sc = v // 64 + 1
        score_m = resolver._grmatch_matrix(varsigs, varsigs, sc)

        # python reference path
        cent_py = np.zeros((n, v), bool)
        for i in range(n):
            bs = [0] * 5
            bj = [0] * 5
            row = score_m[i]
            for j in range(n):
                for k in range(5):
                    for l in range(k + 1, 5):
                        if bs[l] < bs[k]:
                            bs[k], bs[l] = bs[l], bs[k]
                            bj[k], bj[l] = bj[l], bj[k]
                s = int(row[j])
                if s > bs[0]:
                    bs[0] = s
                    bj[0] = j
            cent_py[i] = varsigs[bj].sum(axis=0) > 2
        cent_na = native.kmeans_top5_centroids(
            score_m, varsigs.astype(np.uint8)).astype(bool)
        np.testing.assert_array_equal(cent_na, cent_py)

        cent_scores = resolver._grmatch_matrix(cent_py, varsigs, sc)
        mingroup = 6
        cn_py = np.zeros(n, np.int64)
        cs = np.zeros(n, np.int64)
        for i in range(n):
            best_s, best_j = 0, 0
            col = cent_scores[:, i]
            for j in range(n):
                if int(col[j]) > best_s and i != j:
                    best_s, best_j = int(col[j]), j
            cn_py[i] = best_j
            cs[best_j] += 1
        for mn in range(2, mingroup):
            for i in range(n):
                if cs[cn_py[i]] <= mn:
                    best_s, best_j = 0, 0
                    col = cent_scores[:, i]
                    for j in range(n):
                        if cs[j] >= mn and cn_py[i] != j and \
                                int(col[j]) > best_s and i != j:
                            best_s, best_j = int(col[j]), j
                    cs[cn_py[i]] -= 1
                    cn_py[i] = best_j
                    cs[best_j] += 1
        cn_na = native.kmeans_assign_dissolve(cent_scores, mingroup)
        np.testing.assert_array_equal(cn_na, cn_py)


def test_editdp_backtrack_parity(lib):
    from repeatresolver_tpu.ops import editdp

    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 60).astype(np.int16)
    lens = [10, 25, 40]
    qpad = np.full((3, 40), 100, np.int16)
    for i, lq in enumerate(lens):
        qpad[i, :lq] = rng.integers(0, 4, lq)
    codes, fr = editdp.align_with_codes(
        qpad, np.array(lens, np.int32), t)
    codes, fr = np.asarray(codes), np.asarray(fr)
    entries = np.array([editdp.entry_column(fr[r]) for r in range(3)])
    a_native = editdp.backtrack_batch(codes, np.array(lens), entries,
                                      use_native=True)
    a_python = editdp.backtrack_batch(codes, np.array(lens), entries,
                                      use_native=False)
    np.testing.assert_array_equal(a_native, a_python)


def test_initial_align_native_matches_device(lib):
    import jax

    from repeatresolver_tpu.models import initial_aligner as ia
    rng = np.random.default_rng(7)
    tmpl = rng.integers(0, 4, 120).astype(np.int16)
    seqs = []
    for lq in (30, 55, 80, 0, 100):
        if lq == 0:
            seqs.append(np.empty(0, np.int16))
            continue
        start = rng.integers(0, 30)
        q = tmpl[start:start + lq].copy()
        mut = rng.random(len(q)) < 0.1
        q[mut] = rng.integers(0, 4, mut.sum())
        seqs.append(q)
    a_nat, e_nat = ia.align_all(tmpl, seqs, use_native=True)
    a_dev, e_dev = ia.align_all(tmpl, seqs, use_native=False)
    for x, y in zip(a_nat, a_dev):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_allclose(
        np.nan_to_num(e_nat, nan=-1), np.nan_to_num(e_dev, nan=-1))


def test_device_block_size_shrinks_with_bucket(lib):
    # long sequences must still align when the codes budget forces
    # single-row blocks (the OOM guard for uncut reads); results are
    # identical to the unconstrained device path
    from repeatresolver_tpu.models import initial_aligner as ia
    rng = np.random.default_rng(11)
    tmpl = rng.integers(0, 4, 200).astype(np.int16)
    seqs = []
    for lq in (40, 300, 600, 70, 500):
        q = rng.integers(0, 4, lq).astype(np.int16)
        q[: min(lq, 200)] = tmpl[: min(lq, 200)]
        seqs.append(q)
    # budget of one 512-bucket row: buckets 512 get B=1, 256 gets B=2
    a_small, e_small = ia.align_all(tmpl, seqs, use_native=False,
                                    codes_budget=512 * 200)
    a_big, e_big = ia.align_all(tmpl, seqs, use_native=False)
    for x, y in zip(a_small, a_big):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_allclose(e_small, e_big)
