"""Atlas DMA-kernel engine (ops/pallas_atlas + parallel/atlas_engine):
interpret-mode correctness on small sparse data.

The kernel's proposal/conflict/acceptance/atom machinery is shared
code-for-code with the fused dense kernel (whose bitwise differential
oracle lives in test_pallas_sweep.py); what is new here is the
DMA-plane alpha path, checked by

  * structural invariants: atom-table mass == matrix mass per element
    (the GAPS_DEBUG drift oracle, utils/debug.py analog) after real
    update calls, and CSR metadata round-trips;
  * equilibrium equivalence: the atlas engine and the XLA sparse
    engine (sparse_engine.SparseEngine semantics via ops/sweep +
    models/sparse — an independent implementation of the same closed
    forms) reach the same chi^2 band on the same small data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogaps_tpu.engine import EQUILIBRATION, SAMPLING
from cogaps_tpu.io.h5 import CooMatrix
from cogaps_tpu.ops.atoms import total_mass_per_element
from cogaps_tpu.parallel import atlas_engine as ae
from cogaps_tpu.params import CogapsParams


def _toy_coo(G=96, S=64, k=4, seed=0, density=0.3):
    rng = np.random.default_rng(seed)
    A = rng.gamma(2.0, 1.0, (G, k)) * (rng.random((G, k)) < 0.6)
    P = rng.gamma(2.0, 1.0, (k, S)) * (rng.random((k, S)) < 0.6)
    D = A @ P + rng.normal(0, 0.3, (G, S))
    D = np.maximum(np.round(D), 0.0)
    D *= rng.random((G, S)) < density  # extra zeros
    r, c = np.nonzero(D)
    return CooMatrix(rows=r.astype(np.int64), cols=c.astype(np.int64),
                     vals=D[r, c].astype(np.float32), shape=(G, S))


def _mk_engine(coo, k=4, n_iter=60, seed=42, **kw):
    params = CogapsParams(n_patterns=k, n_iterations=n_iter, seed=seed,
                          sparse_optimization=True)
    cfg = params.engine_config(coo.shape[0], coo.shape[1])
    defaults = dict(batch=128, group=16, seg=8, capacity=2048, s_max=24)
    defaults.update(kw)
    return ae.AtlasEngine(coo, cfg, **defaults)


def test_build_side_roundtrip():
    coo = _toy_coo()
    side = ae.build_side(np.asarray(coo.rows, np.int32),
                         np.asarray(coo.cols, np.int32),
                         np.asarray(coo.vals), coo.shape[0], seg=8)
    meta = np.asarray(side.meta)
    idx = np.asarray(side.idx)
    val = np.asarray(side.val)
    # every row's nonzeros are where meta says, even-aligned
    counts = np.bincount(np.asarray(coo.rows), minlength=coo.shape[0])
    for r in [0, 1, coo.shape[0] // 2, coo.shape[0] - 1]:
        start = int(meta[r, 0]) * 2
        ln = int(meta[r, 1])
        assert ln == counts[r]
        got = sorted(idx[start:start + ln])
        want = sorted(np.asarray(coo.cols)[np.asarray(coo.rows) == r])
        assert got == list(want)
        assert start % 2 == 0
    # dr lanes zero on padding
    assert np.all(val[idx == 0] >= 0)


def test_rebuild_plane_values():
    coo = _toy_coo()
    k = 4
    side = ae.build_side(np.asarray(coo.rows, np.int32),
                         np.asarray(coo.cols, np.int32),
                         np.asarray(coo.vals), coo.shape[0], seg=8)
    rng = np.random.default_rng(1)
    partner = jnp.asarray(rng.gamma(2.0, 1.0, (coo.shape[1], k)
                                    ).astype(np.float32))
    plane = np.asarray(ae.rebuild_plane(
        jnp.zeros((side.nnz_pad // 2, 128), jnp.float32), side.idx,
        side.drpack, partner, k))
    idx = np.asarray(side.idx)
    val = np.asarray(side.val)
    pn = np.asarray(partner)
    # spot-check a handful of nonzeros in both halves
    pos = np.nonzero(val)[0][:40]
    for j in pos:
        half = j % 2
        row = j // 2
        base = half * 64
        np.testing.assert_allclose(plane[row, base:base + k], pn[idx[j]],
                                   rtol=0, atol=0)
        np.testing.assert_allclose(plane[row, base + ae.DR_LANE],
                                   1.0 / val[j], rtol=1e-6)
        np.testing.assert_allclose(plane[row, base + ae.DR2_LANE],
                                   (1.0 / val[j]) ** 2, rtol=1e-6)


@pytest.mark.slow
def test_atlas_engine_runs_and_mass_invariant():
    coo = _toy_coo()
    eng = _mk_engine(coo, n_iter=30)
    state = eng.init_state()
    stats = eng.init_stats()
    key = jax.random.PRNGKey(7)
    state, stats = eng.run_phase(state, stats, key, EQUILIBRATION,
                                 stop_iter=30)
    k = eng.k
    # mass drift oracle: atom-table mass equals the matrix entries
    for atoms, mmir, nr in ((state.atoms_a, state.mmir_a, eng.n_genes),
                            (state.atoms_p, state.mmir_p,
                             eng.n_samples)):
        per_elem = np.asarray(
            total_mass_per_element(atoms, nr * k)).reshape(nr, k)
        M = np.asarray(mmir[:, :k])
        np.testing.assert_allclose(M, per_elem, rtol=2e-4, atol=2e-4)
    # metadata lanes survived the write-backs
    np.testing.assert_array_equal(
        np.asarray(state.mmir_a[:, ae.MROW_LEN]),
        np.asarray(eng.side_a.meta[:, 1]))
    assert int(state.atoms_a.n) > 0
    assert int(state.atoms_p.n) > 0


@pytest.mark.slow
def test_atlas_vs_xla_sparse_equilibrium():
    """Same data, independent implementations of the same sparse model:
    equilibrium chi^2 must land in the same band."""
    coo = _toy_coo(G=64, S=48, k=3, seed=3, density=0.5)
    n_iter = 120

    # XLA sparse reference chain (sparse_engine)
    from cogaps_tpu import api
    D = np.zeros(coo.shape, np.float32)
    D[np.asarray(coo.rows), np.asarray(coo.cols)] = np.asarray(coo.vals)
    res = api.CoGAPS(D, n_patterns=3, n_iterations=n_iter, seed=11,
                     sparse_optimization=True, use_pallas=False,
                     messages=False)
    ref_chisq = float(res.diagnostics["meanChiSq"])

    eng = _mk_engine(coo, k=3, n_iter=n_iter, seed=11)
    state = eng.init_state()
    stats = eng.init_stats()
    key = jax.random.PRNGKey(11)
    state, stats = eng.run_phase(state, stats, key, EQUILIBRATION,
                                 stop_iter=n_iter)
    state, stats = eng.run_phase(state, stats, key, SAMPLING,
                                 stop_iter=n_iter)
    # compare equilibrium chi^2 (computed directly from the final
    # factors with the XLA closed form) against the reference chain's
    # meanChiSq — both should sit at the same likelihood level
    from cogaps_tpu.models import sparse as sp
    ell_a = sp.coo_to_ell(np.asarray(coo.rows, np.int32),
                          np.asarray(coo.cols, np.int32),
                          np.asarray(coo.vals), coo.shape[0])
    M_a = state.mmir_a[:, :eng.k]
    M_p = state.mmir_p[:, :eng.k]
    atlas_chisq = float(sp.sparse_chisq(ell_a, M_a, M_p))
    assert 0.4 * ref_chisq < atlas_chisq < 2.5 * ref_chisq, (
        atlas_chisq, ref_chisq)


@pytest.mark.slow
def test_atlas_kernel_matches_xla_oracle_per_call():
    """Strongest oracle: every update call of the atlas kernel, from
    the kernel's own trajectory, replayed through ops/sweep.run_updates
    with models/sparse.make_model on identical state/keys — budgets,
    sweep counts, per-type acceptance and the factor matrix must agree
    (values to reduction-order tolerance)."""
    from cogaps_tpu.models import sparse as sp
    from cogaps_tpu.ops.sweep import run_updates
    import cogaps_tpu.parallel.atlas_engine as ae_mod
    import cogaps_tpu.ops.pallas_atlas as pa

    coo = _toy_coo(G=64, S=48, k=3, seed=3, density=0.5)
    eng = _mk_engine(coo, k=3, n_iter=120, seed=11)
    state = eng.init_state()
    stats = eng.init_stats()
    key = jax.random.PRNGKey(11)
    k = eng.k
    ell_a = sp.coo_to_ell(np.asarray(coo.rows, np.int32),
                          np.asarray(coo.cols, np.int32),
                          np.asarray(coo.vals), coo.shape[0])
    ell_p = sp.coo_to_ell(np.asarray(coo.cols, np.int32),
                          np.asarray(coo.rows, np.int32),
                          np.asarray(coo.vals), coo.shape[1])

    orig = pa.run_updates_atlas
    calls = []

    def spy(*a, **kw):
        out = orig(*a, **kw)
        calls.append((a, out))
        return out

    ae_mod.run_updates_atlas = spy
    try:
        from cogaps_tpu.engine import EQUILIBRATION as EQ
        for it in range(8):
            calls.clear()
            pre_mmir_p = state.mmir_p
            state, stats = eng._iteration_impl(
                state, stats, jnp.asarray(it, jnp.int32), key,
                eng._arrs, phase=EQ, with_chisq=False)
            for nm, (a, out), ell, partner in (
                    ("A", calls[0], ell_a, pre_mmir_p[:, :k]),
                    ("P", calls[1], ell_p, calls[0][1][1][:, :k])):
                (key2, atoms, mmir, vcol, z2v, colnzv, temp, n_steps,
                 consts, mass, app) = a
                model = sp.make_model(ell, sp.make_sparse_phase(partner))
                a2, M2, _, done, ns, cnt = run_updates(
                    key2, atoms, mmir[:, :k], (), temp, n_steps, consts,
                    mass, model=model)
                assert int(done) == int(out[2]), (it, nm)
                assert int(ns) == int(out[3]), (it, nm)
                np.testing.assert_array_equal(
                    np.asarray(cnt.accepted), np.asarray(out[4].accepted),
                    err_msg=f"it={it} {nm}")
                Mk = np.asarray(out[1][:, :k])
                Mo = np.asarray(M2)
                np.testing.assert_allclose(Mk, Mo, atol=5e-3,
                                           rtol=1e-4,
                                           err_msg=f"it={it} {nm}")
    finally:
        ae_mod.run_updates_atlas = orig
