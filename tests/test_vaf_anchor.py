"""End-to-end VAF regression anchor for the tutorial pipeline.

The reference notebook reports overall VAF 0.956665 (rank 2) and
0.975424 (rank 3) on ``dynamic_trial.csv`` (reference
docs/source/tutorials/"Finding muscle synergies.ipynb" cell 28) — the
only quantitative end-to-end output the reference publishes.  That file
is missing from the mirror, so this suite pins a statistically similar
synthetic trial (:func:`muscle_synergies_tpu.testing.synthesize_gait_emg`,
calibrated to land in the same VAF regime) through the identical
pipeline.  Any change to zero-center, RMS, time-normalize, normalize or
the NMF solver that shifts end-to-end numerics moves these anchors.
"""

import numpy as np
import pytest

from muscle_synergies_tpu import analysis, find_synergies
from muscle_synergies_tpu.testing import GAIT_MUSCLES, synthesize_gait_emg

# Anchors measured at float64 with the calibrated generator defaults;
# the notebook's values on the real capture are 0.956665 / 0.975424.
ANCHOR_RANK2 = 0.956695
ANCHOR_RANK3 = 0.975237
TOL = 5e-4


@pytest.fixture(scope="module")
def tutorial_vaf():
    emg = synthesize_gait_emg()
    fs = 2000.0
    x = analysis.zero_center(emg)
    x = analysis.rms(x, window_size=0.5, sampling_frequency=fs)
    x = analysis.time_normalize(x, reduce_to=200)
    x = analysis.normalize(x)
    return find_synergies(x.abs(), 2, 3, max_iter=50_000, tol=1e-6)


def test_rank2_anchor(tutorial_vaf):
    vaf2 = float(tutorial_vaf.vaf_values.loc[2].iloc[0])
    assert abs(vaf2 - ANCHOR_RANK2) < TOL


def test_rank3_anchor(tutorial_vaf):
    vaf3 = float(tutorial_vaf.vaf_values.loc[3].iloc[0])
    assert abs(vaf3 - ANCHOR_RANK3) < TOL


def test_notebook_regime(tutorial_vaf):
    """The qualitative facts the notebook establishes."""
    vaf2 = float(tutorial_vaf.vaf_values.loc[2].iloc[0])
    vaf3 = float(tutorial_vaf.vaf_values.loc[3].iloc[0])
    # 90% VAF is crossed already at rank 2, and rank 3 improves on it
    assert vaf2 > 0.90
    assert vaf3 > vaf2
    # per-muscle VAF columns follow the montage
    assert list(tutorial_vaf.vaf_values.columns[1:]) == list(GAIT_MUSCLES)


def test_generator_is_deterministic():
    a = synthesize_gait_emg(n_samples=2000)
    b = synthesize_gait_emg(n_samples=2000)
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())
