"""Golden parity of the serial realigner vs the compiled PW_ReAligner:
identical per-round OverallScore trajectory and byte-identical MSAreal."""
import os
import re
import subprocess

import numpy as np
import pytest

from repeatresolver_tpu.config import RealignerConfig
from repeatresolver_tpu.models import realigner
from repeatresolver_tpu.utils import io as rio

BAND = 120


@pytest.fixture(scope="module")
def small_msa(tmp_path_factory):
    """Hand-built small MSA with gaps, spaces, and misalignments that
    the realigner can actually improve."""
    rng = np.random.default_rng(42)
    rows, tlen = 14, 260
    tpl = rng.integers(0, 4, tlen)
    msa = np.full((rows, tlen), 5, np.int8)
    for r in range(rows):
        lo = rng.integers(0, 30)
        hi = tlen - rng.integers(0, 30)
        seg = tpl[lo:hi].copy()
        # noise: substitutions and gaps
        sub = rng.random(len(seg)) < 0.08
        seg[sub] = rng.integers(0, 4, sub.sum())
        gap = rng.random(len(seg)) < 0.10
        seg[gap] = 4
        msa[r, lo:hi] = seg
    d = tmp_path_factory.mktemp("remsa")
    path = os.path.join(d, "MSA_in")
    rio.write_msa(path, msa, upper=True)
    return d, path, msa


def run_c_realigner(bins, d, msa_path):
    out = os.path.join(d, "MSAreal_c")
    r = subprocess.run(
        [str(bins / "PW_ReAligner"), msa_path, "-o", out,
         "-b", str(BAND)],
        cwd=d, check=True, capture_output=True, text=True)
    scores = [int(s) for s in
              re.findall(r"OverallScore: (\d+)", r.stdout)]
    return out, scores


def test_realigner_trajectory_and_bytes(reference_bins, small_msa):
    d, path, msa = small_msa
    c_out, c_scores = run_c_realigner(reference_bins, d, path)

    my_out = os.path.join(d, "MSAreal_py")
    log = []
    realigner.realign(msa.copy(), RealignerConfig(bandwidth=BAND),
                      out_path=my_out, score_log=log)
    my_scores = [m * 1000000 + u for (m, u) in log]
    assert my_scores == c_scores, (my_scores, c_scores)
    assert my_scores[-1] <= my_scores[0]
    assert open(my_out, "rb").read() == open(c_out, "rb").read()


def test_realigner_on_pipeline_msa(reference_bins, cpipe_msa):
    """Same check on a real InitialAligner-produced MSA."""
    d, msa_path = cpipe_msa
    c_out, c_scores = run_c_realigner(reference_bins, d, msa_path)
    msa = rio.read_msa(msa_path)
    my_out = os.path.join(d, "MSAreal_py")
    log = []
    realigner.realign(msa, RealignerConfig(bandwidth=BAND),
                      out_path=my_out, score_log=log)
    my_scores = [m * 1000000 + u for (m, u) in log]
    assert my_scores == c_scores, (my_scores, c_scores)
    assert open(my_out, "rb").read() == open(c_out, "rb").read()


@pytest.fixture(scope="module")
def cpipe_msa(reference_bins, tiny_dataset, tmp_path_factory):
    import shutil
    ds, paths = tiny_dataset
    d = tmp_path_factory.mktemp("cpipe")
    for p in paths.values():
        shutil.copy(p, d)
    name = ds.name
    subprocess.run(
        [str(reference_bins / "ReadCutter"), f"{name}_Template.fasta",
         f"{name}.fasta", "-p", "4"],
        cwd=d, check=True, capture_output=True)
    subprocess.run(
        [str(reference_bins / "InitialAligner"), f"{name}_Template.fasta",
         f"{name}_Seq.fasta"],
        cwd=d, check=True, capture_output=True)
    return str(d), os.path.join(str(d), f"{name}_MSA")
