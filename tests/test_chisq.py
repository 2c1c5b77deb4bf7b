"""The key numerical-correctness oracle (tests/testthat/test_chisq.R:3-17):
reported meanChiSq must equal the hand-computed sum(((D - A@P.T)/S)^2)."""

import numpy as np
import pytest

from cogaps_tpu import CoGAPS
from cogaps_tpu.models.dense import default_uncertainty


def test_mean_chisq_matches_manual_default_uncertainty(modsim):
    D, _, _ = modsim
    res = CoGAPS(D, n_patterns=3, n_iterations=200, seed=9, messages=False)
    S = default_uncertainty(D)
    manual = np.sum(((D - res.Amean @ res.Pmean.T) / S) ** 2)
    assert res.mean_chi_sq == pytest.approx(manual, rel=1e-5)


def test_mean_chisq_matches_manual_custom_uncertainty(modsim):
    D, _, _ = modsim
    rng = np.random.default_rng(3)
    S = (0.3 + rng.random(D.shape)).astype(np.float32)
    res = CoGAPS(D, n_patterns=3, n_iterations=200, seed=9,
                 uncertainty=S, messages=False)
    manual = np.sum(((D - res.Amean @ res.Pmean.T) / S) ** 2)
    assert res.mean_chi_sq == pytest.approx(manual, rel=1e-5)


def test_chisq_history_is_live_chisq(modsim):
    """The recorded history entries must be the true chi^2 of the live
    factor state (spot check: final entry vs final state recomputation is
    validated in test_engine.test_residual_consistency; here: positive,
    finite, monotone-ish trend)."""
    D, _, _ = modsim
    res = CoGAPS(D, n_patterns=3, n_iterations=300, seed=9, messages=False,
                 output_frequency=50)
    hist = res.diagnostics["chisqHistory"]
    assert hist.shape == (12,)  # 2 phases x 300/50
    assert np.isfinite(hist).all() and (hist > 0).all()
    assert hist[-1] < hist[0]
