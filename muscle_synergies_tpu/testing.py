"""Synthetic capture generators for tests and benchmarks.

The reference tutorial's quantitative anchors (overall VAF 0.956665 at
rank 2 and 0.975424 at rank 3 on ``dynamic_trial.csv``; reference
docs/source/tutorials/"Finding muscle synergies.ipynb" cell 28) cannot
be regression-tested directly because that capture is absent from the
mirror (``.MISSING_LARGE_BLOBS``).  :func:`synthesize_gait_emg` fills
the gap: a statistically similar 8-channel gait EMG whose
envelope-pipeline output lands in the same VAF regime —
0.956695 / 0.975237 with the calibrated defaults — so the full
zero-center → RMS → time-normalize → normalize → NMF chain is pinned
end-to-end (tests/test_vaf_anchor.py).  If the real file ever appears,
swap the anchors (TODO.md tracks it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["synthesize_gait_emg", "GAIT_MUSCLES"]

#: The tutorial trial's electrode montage (reference notebook cell 8).
GAIT_MUSCLES = ("VL", "RF", "GMED", "TFL", "GMAXS", "GMAXI", "BF", "ST")


def _smooth_nonneg(noise: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian-smooth along axis 0 and rectify."""
    from scipy.ndimage import gaussian_filter1d

    return np.maximum(gaussian_filter1d(noise, sigma, axis=0), 0.0)


def synthesize_gait_emg(
    n_samples: int = 20_000,
    sampling_frequency: float = 2000.0,
    unique_weight: float = 0.66,
    noise: float = 0.02,
    stride_period: float = 1.1,
    seed: int = 12345,
) -> pd.DataFrame:
    """Raw 8-channel gait-like surface EMG with two shared synergies.

    Construction: two raised-cosine activation patterns phase-shifted
    across the stride (the stance/swing pair the tutorial's rank-2
    factorization captures) drive all channels through a random
    nonnegative mixing matrix; each channel additionally carries
    slowly-varying idiosyncratic activity (``unique_weight`` scales it
    relative to the shared envelope) that no low-rank factorization can
    explain — the quantity that sets the VAF plateau.  The envelopes
    modulate white carriers, like rectifiable raw EMG.

    With the defaults, running the tutorial pipeline (zero-center →
    0.5 s RMS → time-normalize to 200 → amplitude-normalize → NMF)
    yields overall VAF 0.956695 (rank 2) and 0.975237 (rank 3),
    matching the reference notebook's 0.956665 / 0.975424 regime.

    Returns:
        ``(n_samples, 8)`` DataFrame with the tutorial's muscle labels.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / sampling_frequency
    phase = 2.0 * np.pi * t / stride_period
    shared = np.stack(
        [
            np.maximum(0.0, np.cos(phase)) ** 2,
            np.maximum(0.0, np.cos(phase - 2.2)) ** 2,
        ],
        axis=1,
    )
    mixing = rng.random((2, len(GAIT_MUSCLES))) + 0.1
    envelope = shared @ mixing

    idiosyncratic = _smooth_nonneg(
        rng.standard_normal((n_samples, len(GAIT_MUSCLES))), sigma=400.0
    )
    idiosyncratic = (
        idiosyncratic
        / idiosyncratic.std(axis=0, keepdims=True)
        * envelope.std(axis=0, keepdims=True)
    )
    envelope = envelope + unique_weight * idiosyncratic

    carrier = rng.standard_normal((n_samples, len(GAIT_MUSCLES)))
    raw = envelope * carrier + noise * rng.standard_normal(
        (n_samples, len(GAIT_MUSCLES))
    )
    return pd.DataFrame(raw, columns=list(GAIT_MUSCLES))
