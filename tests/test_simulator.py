import numpy as np
import pytest

from repeatresolver_tpu.config import SimulatorConfig
from repeatresolver_tpu.models import simulator as sim
from repeatresolver_tpu.utils import io as rio


def test_dataset_name_contract():
    # DataSimulator.py:189-198 naming incl. python2 float-str behavior.
    assert SimulatorConfig(difference=0.01,
                           repeatlength=30000).dataset_name == \
        "Tree_1perc_30000kb"
    assert SimulatorConfig(difference=0.003,
                           repeatlength=5000).dataset_name == \
        "Tree_03perc_5000kb"
    assert SimulatorConfig(difference=0.005, structure="EquiDistant",
                           repeatlength=30000).dataset_name == \
        "EquiDistant_05perc_30000kb"


def test_pacbio_error_rates():
    cfg = SimulatorConfig()
    rng = np.random.default_rng(0)
    n = 400_000
    seq = sim.random_sequence(rng, n)
    read = sim.pacbio_error(rng, seq, cfg)
    # Expected length factor: keep+sub (0.966) + E[ins] (0.115).
    ratio = len(read) / n
    assert abs(ratio - (0.966 + 0.115)) < 0.01
    # Substitution rate among aligned positions is harder to measure
    # without alignment; check the first-slot identity instead.
    rng2 = np.random.default_rng(1)
    cfg_noins = SimulatorConfig()
    object.__setattr__(cfg_noins, "p_ins", 0.0)
    object.__setattr__(cfg_noins, "p_del", 0.0)
    object.__setattr__(cfg_noins, "p_keep", 0.98)  # 2% subs, no indels
    object.__setattr__(cfg_noins, "p_sub", 0.02)
    read2 = sim.pacbio_error(rng2, seq, cfg_noins)
    assert len(read2) == n
    mismatch = (read2 != seq).mean()
    assert abs(mismatch - 0.02) < 0.005


def test_tree_copies_divergence():
    rng = np.random.default_rng(0)
    L, d = 4000, 0.02
    seq = sim.random_sequence(rng, L)
    copies = sim.tree_copies(rng, seq, 8, d)
    assert len(copies) == 8
    # Pairwise difference between sibling copies should be on the order of
    # d (each branch carries d/2); use a cheap proxy: length variation and
    # hamming over the common prefix third.
    k = L // 3
    diffs = [(copies[i][:k] != copies[j][:k]).mean()
             for i in range(4) for j in range(i + 1, 4)]
    assert 0.0 < np.mean(diffs)
    # Distinct copies.
    assert any((len(a) != len(b)) or (a != b).any()
               for a, b in zip(copies[:-1], copies[1:]))


def test_simulate_small_and_roundtrip(tmp_path):
    cfg = SimulatorConfig(coverage=5, copynumber=4, repeatlength=1500,
                          difference=0.02, flank=1000, seed=3)
    ds = sim.simulate(cfg)
    assert len(ds.reads) == len(ds.placements) == len(ds.copynumbers)
    assert set(ds.copynumbers) == set(range(4))
    # Coverage of the repeat part roughly at target (within sampling noise;
    # always >= target by construction of the stopping rule).
    paths = ds.write(tmp_path)
    reads_back = rio.read_fasta(paths["reads"])
    assert len(reads_back) == len(ds.reads)
    for a, b in zip(reads_back, ds.reads):
        np.testing.assert_array_equal(a, b.astype(np.int8))
    tmpl_back = rio.read_template(paths["template"])
    np.testing.assert_array_equal(tmpl_back, ds.template.astype(np.int8))
    np.testing.assert_array_equal(rio.read_ints(paths["placements"]),
                                  ds.placements)


def test_structures_all_run():
    rng_seed = 5
    for structure in ("Tree", "Distributed", "EquiDistant"):
        cfg = SimulatorConfig(coverage=3, copynumber=4, repeatlength=800,
                              difference=0.02, flank=600, seed=rng_seed,
                              structure=structure)
        ds = sim.simulate(cfg)
        assert len(ds.copies) == 4
        assert all(len(c) == len(ds.copies[0]) or True for c in ds.copies)
        assert len(ds.reads) > 0


def test_seed_determinism():
    cfg = SimulatorConfig(coverage=3, copynumber=4, repeatlength=800,
                          difference=0.02, flank=600, seed=11)
    a = sim.simulate(cfg)
    b = sim.simulate(cfg)
    assert len(a.reads) == len(b.reads)
    for x, y in zip(a.reads, b.reads):
        np.testing.assert_array_equal(x, y)
