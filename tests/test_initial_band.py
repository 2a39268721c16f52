"""Banded initial alignment (the paper-scale path) vs full DP.

The anchored band must reproduce the full-matrix IntoAligner result for
every piece whose alignment is real (class 'r', error < 0.30,
InitialAligner.c:654-657); garbage flank pieces may differ but must
stay class 'l' (banded error can only overestimate)."""
import numpy as np

from repeatresolver_tpu import config as C
from repeatresolver_tpu.models import initial_aligner as ia
from repeatresolver_tpu.models import read_cutter, simulator


def _pieces(seed=11, coverage=20, copynumber=4, repeatlength=2500):
    cfg = C.SimulatorConfig(coverage=coverage, copynumber=copynumber,
                            repeatlength=repeatlength, flank=2000,
                            seed=seed)
    ds = simulator.simulate(cfg)
    template = ds.template.astype(np.int16)
    reads = [r.astype(np.int16) for r in ds.reads]
    cut = read_cutter.cut_reads(template, reads, C.ReadCutterConfig())
    return template, [p.astype(np.int16) for p in cut.pieces]


def test_banded_matches_full_on_real_pieces():
    template, seqs = _pieces()
    full_a, full_e = ia.align_all(template, seqs, use_native=True)
    band_a, band_e = ia.align_all(template, seqs, use_native=True,
                                  band=1200)
    n_r = 0
    for a0, a1, e0, e1 in zip(full_a, band_a, full_e, band_e):
        if np.isnan(e0) or e0 >= 0.30:
            # class 'l' either way: banded error only overestimates
            assert np.isnan(e1) or e1 >= e0 - 1e-12
            continue
        n_r += 1
        assert e1 == e0
        assert np.array_equal(a1, a0)
    assert n_r >= 20  # the dataset must actually exercise real pieces


def test_banded_equals_full_when_band_covers_everything():
    rng = np.random.default_rng(0)
    template = rng.integers(0, 4, 300).astype(np.int16)
    seqs = [rng.integers(0, 4, rng.integers(50, 280)).astype(np.int16)
            for _ in range(30)]
    full_a, full_e = ia.align_all(template, seqs, use_native=True)
    band_a, band_e = ia.align_all(template, seqs, use_native=True,
                                  band=700)
    for a0, a1, e0, e1 in zip(full_a, band_a, full_e, band_e):
        assert e1 == e0
        assert np.array_equal(a1, a0)


def test_anchor_centers_track_offset_pieces():
    """A piece from the template interior must get a center path at its
    true offset, not the scaled diagonal."""
    rng = np.random.default_rng(3)
    template = rng.integers(0, 4, 10000).astype(np.int16)
    piece = template[6000:9000].copy()
    sub = rng.random(len(piece)) < 0.10
    piece[sub] = (piece[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
    tindex = ia.TemplateIndex(template)
    cen = ia.anchor_centers(tindex, piece)
    assert cen is not None
    mid = cen[len(piece) // 2]
    assert abs(int(mid) - 7500) < 100
