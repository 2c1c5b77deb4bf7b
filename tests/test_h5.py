"""HDF5 / 10x / AnnData ingestion (reference: R/HelperFunctions.R:11-42
h5 slices; nextflow/main.nf:62-177 10x/AnnData conversion processes)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
scipy_sparse = pytest.importorskip("scipy.sparse")

from cogaps_tpu import CoGAPS
from cogaps_tpu.io.h5 import CooMatrix, read_any_h5


@pytest.fixture(scope="module")
def h5_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("h5")
    rng = np.random.default_rng(5)
    A = (rng.gamma(2, 1, (30, 3)) * (rng.random((30, 3)) < 0.5)
         ).astype(np.float32)
    P = (rng.gamma(2, 1, (20, 3)) * (rng.random((20, 3)) < 0.5)
         ).astype(np.float32)
    D = (A @ P.T).astype(np.float32)

    plain = str(root / "plain.h5")
    with h5py.File(plain, "w") as f:
        f["counts"] = D
        f["row_names"] = np.array([f"g{i}".encode() for i in range(30)])
        f["col_names"] = np.array([f"c{i}".encode() for i in range(20)])

    tenx = str(root / "tenx.h5")
    m = scipy_sparse.csc_matrix(D)
    with h5py.File(tenx, "w") as f:
        g = f.create_group("matrix")
        g["data"] = m.data
        g["indices"] = m.indices
        g["indptr"] = m.indptr
        g["shape"] = np.array(D.shape)
        g.create_group("features")["name"] = np.array(
            [f"g{i}".encode() for i in range(30)])
        g["barcodes"] = np.array([f"c{i}".encode() for i in range(20)])

    h5ad = str(root / "ann.h5ad")
    mc = scipy_sparse.csr_matrix(D.T)
    with h5py.File(h5ad, "w") as f:
        X = f.create_group("X")
        X.attrs["encoding-type"] = "csr_matrix"
        X.attrs["shape"] = np.array(D.T.shape)
        X["data"] = mc.data
        X["indices"] = mc.indices
        X["indptr"] = mc.indptr
        obs = f.create_group("obs")
        obs.attrs["_index"] = "cell"
        obs["cell"] = np.array([f"c{i}".encode() for i in range(20)])
        var = f.create_group("var")
        var.attrs["_index"] = "gene"
        var["gene"] = np.array([f"g{i}".encode() for i in range(30)])
    return D, plain, tenx, h5ad


def test_readers_agree(h5_files):
    D, plain, tenx, h5ad = h5_files
    m1, g1, c1 = read_any_h5(plain)
    m2, g2, c2 = read_any_h5(tenx)
    m3, g3, c3 = read_any_h5(h5ad)
    assert isinstance(m2, CooMatrix) and isinstance(m3, CooMatrix)
    np.testing.assert_allclose(m1, D)
    np.testing.assert_allclose(m2.to_dense(), D)
    np.testing.assert_allclose(m3.to_dense(), D)
    assert g1 == g2 == g3
    assert c1 == c2 == c3


def test_h5ad_end_to_end_sparse(h5_files):
    """.h5ad -> COO -> sparse engine with no densification in the data
    path; names flow into the result."""
    D, _, _, h5ad = h5_files
    res = CoGAPS(h5ad, n_patterns=3, n_iterations=80, seed=2,
                 messages=False)
    assert res.Amean.shape == (30, 3)
    assert res.gene_names[0] == "g0"
    assert res.sample_names[0] == "c0"
    assert res.mean_chi_sq > 0


def test_coo_input_direct(h5_files):
    D, _, _, _ = h5_files
    rows, cols = np.nonzero(D)
    coo = CooMatrix(rows=rows.astype(np.int32), cols=cols.astype(np.int32),
                    vals=D[rows, cols].astype(np.float32), shape=D.shape)
    res = CoGAPS(coo, n_patterns=3, n_iterations=60, seed=4, messages=False)
    assert res.Amean.shape == (30, 3)
