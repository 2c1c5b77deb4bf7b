"""Top-level API tests — the analog of tests/testthat/test_top_level.R:
every input type, transposition, uncertainty, dimension assertions."""

import numpy as np
import pytest

from cogaps_tpu import CoGAPS, CogapsParams
from cogaps_tpu.io import parsers


def test_matrix_input(modsim):
    D, _, _ = modsim
    res = CoGAPS(D, n_patterns=3, n_iterations=100, seed=1, messages=False)
    assert res.Amean.shape == (25, 3)
    assert res.Pmean.shape == (20, 3)
    assert res.Asd.shape == (25, 3)
    assert res.Psd.shape == (20, 3)
    assert res.mean_chi_sq > 0
    assert len(res.gene_names) == 25
    assert len(res.sample_names) == 20


def test_transpose_data(modsim):
    D, _, _ = modsim
    res = CoGAPS(D.T, n_patterns=3, n_iterations=100, seed=1,
                 transpose_data=True, messages=False)
    assert res.Amean.shape == (25, 3)
    assert res.Pmean.shape == (20, 3)


def test_custom_uncertainty(modsim):
    D, _, _ = modsim
    unc = np.full_like(D, 0.5)
    res = CoGAPS(D, n_patterns=3, n_iterations=100, seed=1,
                 uncertainty=unc, messages=False)
    assert res.Amean.shape == (25, 3)
    # meanChiSq must be computed against the custom uncertainty
    manual = np.sum(((D - res.Amean @ res.Pmean.T) / unc) ** 2)
    assert res.mean_chi_sq == pytest.approx(manual, rel=1e-4)


def test_file_inputs_roundtrip(tmp_path, modsim):
    D, _, _ = modsim
    genes = [f"g{i}" for i in range(25)]
    samples = [f"s{j}" for j in range(20)]
    csv = str(tmp_path / "data.csv")
    parsers.write_csv(csv, D, genes, samples)
    res = CoGAPS(csv, n_patterns=3, n_iterations=50, seed=1, messages=False)
    assert res.gene_names == genes
    assert res.sample_names == samples
    assert res.Amean.shape == (25, 3)


def test_seed_consistency_api(modsim):
    """Same seed => same result through the public API
    (tests/testthat/test_seed_consistency.R:10-21)."""
    D, _, _ = modsim
    r1 = CoGAPS(D, n_patterns=3, n_iterations=150, seed=42, messages=False)
    r2 = CoGAPS(D, n_patterns=3, n_iterations=150, seed=42, messages=False)
    np.testing.assert_array_equal(r1.Amean, r2.Amean)
    np.testing.assert_array_equal(r1.Pmean, r2.Pmean)
    np.testing.assert_array_equal(r1.diagnostics["atomHistoryA"],
                                  r2.diagnostics["atomHistoryA"])


def test_input_validation(modsim):
    D, _, _ = modsim
    with pytest.raises(ValueError):
        CoGAPS(-D, n_patterns=3, n_iterations=10, messages=False)
    with pytest.raises(ValueError):
        bad = D.copy()
        bad[0, 0] = np.nan
        CoGAPS(bad, n_patterns=3, n_iterations=10, messages=False)
    with pytest.raises(ValueError):
        CoGAPS(D, n_patterns=3, n_iterations=10,
               uncertainty=np.full_like(D, 1e-6), messages=False)
    with pytest.raises(ValueError):
        CoGAPS(D, n_patterns=25, n_iterations=10, messages=False)


def test_snapshots(modsim):
    D, _, _ = modsim
    res = CoGAPS(D, n_patterns=3, n_iterations=100, seed=1, messages=False,
                 n_snapshots=4, snapshot_phase="sampling")
    snaps = res.diagnostics["samplingSnapshotsA"]
    assert snaps.shape == (4, 25, 3)
    assert np.abs(snaps).sum() > 0
    # equilibration snapshots not requested => zeros
    assert np.abs(res.diagnostics["equilibrationSnapshotsA"]).sum() == 0


def test_pump(modsim):
    D, _, _ = modsim
    res = CoGAPS(D, n_patterns=3, n_iterations=100, seed=1, messages=False,
                 take_pump_samples=True)
    pump = res.diagnostics["pumpMatrix"]
    assert pump.shape == (25, 3)
    np.testing.assert_allclose(pump.sum(axis=1), 1.0, rtol=1e-5)


def test_gist_run(gist):
    """GIST benchmark dataset: 1363 genes x 9 samples, k=7
    (tests/testthat/test_top_level.R:33-36)."""
    D, rows, cols = gist
    assert D.shape == (1363, 9)
    res = CoGAPS(D, n_patterns=7, n_iterations=100, seed=1, messages=False,
                 gene_names=rows, sample_names=cols)
    assert res.Amean.shape == (1363, 7)
    assert res.Pmean.shape == (9, 7)
    assert np.isfinite(res.mean_chi_sq)
