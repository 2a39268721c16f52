"""repeatresolver_tpu — a TPU-native repeat-resolution engine.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
PhilippBongartz/RepeatResolver (reference mounted at /root/reference):

  simulate -> cut -> initial-align -> realign (sum-of-pairs MSA refinement)
           -> column statistics (MaxCorrs) -> windowed clustering
           -> flank connection -> assessment

Layout:
  models/    pipeline stages as array programs (simulator, read_cutter,
             initial_aligner, realigner, maxcorr, resolver, window,
             assessment)
  ops/       compute kernels (wavefront edit-distance DP, banded realign
             DP in Pallas, bit-group intersections as MXU matmuls,
             log-space hypergeometric tails)
  parallel/  mesh construction, sharded sweeps, collectives
  utils/     file formats (the reference's on-disk contract), checkpoints

Symbols follow the reference encoding throughout:
  0=a 1=c 2=g 3=t 4='-' (alignment gap) 5=' ' (coverage gap)
"""

__version__ = "0.1.0"

A, C, G, T, GAP, SPACE = 0, 1, 2, 3, 4, 5
SYMBOLS = "acgt- "
SYMBOLS_UPPER = "ACGT- "
