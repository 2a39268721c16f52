import numpy as np

from repeatresolver_tpu.utils import io as rio


def test_fasta_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 4, n).astype(np.int8) for n in (5, 250, 1)]
    p = tmp_path / "x.fasta"
    rio.write_fasta(p, seqs)
    back = rio.read_fasta(p)
    assert len(back) == 3
    for a, b in zip(back, seqs):
        np.testing.assert_array_equal(a, b)


def test_msa_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    msa = rng.integers(0, 6, (7, 40)).astype(np.int8)
    p = tmp_path / "MSA"
    rio.write_msa(p, msa, upper=True)
    np.testing.assert_array_equal(rio.read_msa(p), msa)
    rio.write_msa(p, msa, upper=False)
    np.testing.assert_array_equal(rio.read_msa(p), msa)


def test_msa_ragged_raises(tmp_path):
    p = tmp_path / "MSA"
    p.write_bytes(b"ACGT-\nACG\n")
    import pytest
    with pytest.raises(ValueError):
        rio.read_msa(p)


def test_subdivision_format(tmp_path):
    p = tmp_path / "sub"
    rio.write_subdivision(p, [0, 1, -1, 2])
    assert p.read_text() == "0\n1\n-1\n2"  # no trailing newline
    np.testing.assert_array_equal(rio.read_ints(p), [0, 1, -1, 2])


def test_maxcorrs_format(tmp_path):
    p = tmp_path / "MaxCorrsOf_x"
    vals = np.array([0.0, 12.345678, 98.7])
    rio.write_maxcorrs(p, vals)
    assert p.read_text().splitlines()[1] == "12.345678"
    np.testing.assert_allclose(rio.read_maxcorrs(p), vals, atol=1e-6)


def test_readseqinfo_roundtrip(tmp_path):
    p = tmp_path / "info"
    rio.write_readseqinfo(p, [2, 1, 3])
    assert p.read_text() == "0 1 \n2 \n3 4 5 \n"
    np.testing.assert_array_equal(rio.read_readseqinfo(p),
                                  [0, 0, 1, 2, 2, 2])


def test_filename_contract():
    assert rio.data_prefix("Tree_1perc_30000kb_Template.fasta") == \
        "Tree_1perc_30000kb_"
    assert rio.data_prefix("nope.fasta") == ""
    d = rio.derived_paths("X_Template.fasta")
    assert d["seq_fasta"] == "X_Seq.fasta"
    assert d["msa"] == "X_MSA"
    assert rio.maxcorrs_path("X_MSAreal") == "MaxCorrsOf_X_MSAreal"
    assert rio.subdivision_path("Kmeans", 0, 500, "X_MSAreal") == \
        "KmeansSubdivisionOf_0_500_X_MSAreal"


def test_fasta_index_streaming(tmp_path):
    """FastaIndex (the reference's Offsetter, InitialAligner.c:99-158):
    random access by byte offset and streaming iteration both match the
    in-RAM reader."""
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 4, rng.integers(1, 500)).astype(np.int8)
            for _ in range(17)]
    p = tmp_path / "reads.fasta"
    rio.write_fasta(p, seqs, line_width=60)
    full = rio.read_fasta(p)
    idx = rio.FastaIndex(p)
    assert len(idx) == len(full) == 17
    for k in (0, 3, 16, -1):
        np.testing.assert_array_equal(idx[k], full[k])
    for a, b in zip(idx, full):
        np.testing.assert_array_equal(a, b)
