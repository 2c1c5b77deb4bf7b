"""Differential tests: one-hot matmul formulation vs scatter/gather.

ops/onehot.py reformulates every indexed access of the hot sweep as a
one-hot (or triangular) matmul at precision=HIGHEST, claiming bit-exact
agreement with the plain scatter/gather formulation for integer-valued
fp32 bookkeeping < 2^24. This file is that claim's oracle: each primitive
is checked against its jnp indexing equivalent on the same inputs,
including hole patterns, empty/full tables, and invalid (all-zero
one-hot) lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogaps_tpu.ops import onehot as oh

C = 1024  # table capacity (multiple of LANE=128)
B = 64


@pytest.fixture(scope="module")
def table():
    """A hole-y atom table: ~60% live slots, random masses/elements."""
    rng = np.random.default_rng(42)
    live = rng.random(C) < 0.6
    elem = np.where(live, rng.integers(0, 9541, C), -1).astype(np.int32)
    mass = np.where(live, rng.gamma(2.0, 1.0, C), 0.0).astype(np.float32)
    return jnp.asarray(elem), jnp.asarray(mass), int(live.sum())


def test_onehot_gather_rows_matches_indexing():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(200, 9)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 200, B), jnp.int32)
    got = oh.gather_rows(A, oh.onehot(idx, 200))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(A[idx]))


def test_onehot_scatter_add_matches_at_add():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(50, 9)), jnp.float32)
    # distinct rows (the sweep guarantees row-disjoint valid lanes)
    idx = jnp.asarray(rng.permutation(50)[:B // 2], jnp.int32)
    upd = jnp.asarray(rng.normal(size=(B // 2, 9)), jnp.float32)
    got = oh.scatter_add_rows(A, oh.onehot(idx, 50), upd)
    want = A.at[idx].add(upd)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lane_cumsum_matches_cumsum():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 2, (4, 128)), jnp.float32)
    got = oh.lane_cumsum(x)
    want = jnp.cumsum(x, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_live_index_matches_flat_cumsum(table):
    elem, _, _ = table
    li = oh.live_index(elem)
    flat = jnp.cumsum((elem >= 0).astype(jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(li.cum2d).reshape(-1), np.asarray(flat, np.float32))
    free_flat = jnp.arange(1, C + 1) - flat
    np.testing.assert_array_equal(
        np.asarray(li.free2d).reshape(-1), np.asarray(free_flat, np.float32))


def test_rank_to_slot_matches_searchsorted(table):
    elem, _, n = table
    li = oh.live_index(elem)
    rng = np.random.default_rng(3)
    ranks = jnp.asarray(rng.integers(0, n, B), jnp.int32)
    ref = oh.rank_to_slot(li, ranks)
    # scatter/gather reference: searchsorted on the flat live cumsum
    cum = jnp.cumsum((elem >= 0).astype(jnp.int32))
    want = jnp.searchsorted(cum, ranks + 1, side="left")
    np.testing.assert_array_equal(np.asarray(ref.slot), np.asarray(want))
    # the factorized one-hots address exactly that slot
    np.testing.assert_array_equal(
        np.asarray(ref.ohh.argmax(axis=1) * oh.LANE + ref.ohl.argmax(axis=1)),
        np.asarray(want))


def test_free_rank_to_slot_matches_searchsorted(table):
    elem, _, n = table
    li = oh.live_index(elem)
    rng = np.random.default_rng(4)
    ranks = jnp.asarray(rng.integers(0, C - n, B), jnp.int32)
    ref = oh.free_rank_to_slot(li, ranks)
    cum = jnp.cumsum((elem < 0).astype(jnp.int32))
    want = jnp.searchsorted(cum, ranks + 1, side="left")
    np.testing.assert_array_equal(np.asarray(ref.slot), np.asarray(want))


def test_table_gather_matches_indexing(table):
    elem, mass, n = table
    li = oh.live_index(elem)
    rng = np.random.default_rng(5)
    ranks = jnp.asarray(rng.integers(0, n, B), jnp.int32)
    ref = oh.rank_to_slot(li, ranks)
    np.testing.assert_array_equal(
        np.asarray(oh.table_gather_f32(mass, ref)),
        np.asarray(mass[ref.slot]))
    np.testing.assert_array_equal(
        np.asarray(oh.table_gather_i32(elem, ref)),
        np.asarray(elem[ref.slot]))


def test_table_set_matches_at_set(table):
    elem, mass, n = table
    li = oh.live_index(elem)
    rng = np.random.default_rng(6)
    # distinct ranks => distinct slots (the sweep's precondition)
    ranks = jnp.asarray(rng.permutation(n)[:B], jnp.int32)
    ref = oh.rank_to_slot(li, ranks)
    valid = jnp.asarray(rng.random(B) < 0.7)
    vals_f = jnp.asarray(rng.gamma(1.0, 1.0, B), jnp.float32)
    vals_i = jnp.asarray(rng.integers(-1, 9541, B), jnp.int32)

    got_f = oh.table_set_f32(mass, ref, valid, vals_f)
    want_f = mass.at[jnp.where(valid, ref.slot, C)].set(vals_f, mode="drop")
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))

    got_i = oh.table_set_i32(elem, ref, valid, vals_i)
    want_i = elem.at[jnp.where(valid, ref.slot, C)].set(vals_i, mode="drop")
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_int_roundtrip_large_values():
    """12-bit-half transport is exact across the full elem range
    (up to capacity-sized element indices ~2^22)."""
    vals = jnp.asarray([-1, 0, 1, 4095, 4096, 9540, (1 << 22) - 1], jnp.int32)
    n = vals.shape[0]
    elem = jnp.full((oh.LANE,), -1, jnp.int32).at[:n].set(vals)
    li = oh.live_index(jnp.zeros((oh.LANE,), jnp.int32))  # all live
    ranks = jnp.arange(n, dtype=jnp.int32)
    ref = oh.rank_to_slot(li, ranks)
    got = oh.table_gather_i32(elem, ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals))


def test_first_wins_matches_greedy_loop():
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 5, B)  # heavy collisions
    conflict = jnp.asarray(rows[:, None] == rows[None, :])
    got = np.asarray(oh.first_wins(conflict))
    seen, want = set(), np.zeros(B, bool)
    for i in range(B):
        if rows[i] not in seen:
            want[i] = True
            seen.add(rows[i])
    np.testing.assert_array_equal(got, want)


def test_write_at_matches_at_set():
    rng = np.random.default_rng(8)
    arr = jnp.asarray(rng.normal(size=(16, 3, 2)), jnp.float32)
    val = jnp.asarray(rng.normal(size=(1, 3, 2)), jnp.float32)
    got = oh.write_at(arr, jnp.asarray(5), val)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(arr.at[5].set(val[0])))
    # out-of-range index writes nothing
    got2 = oh.write_at(arr, jnp.asarray(-1), val)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(arr))


def test_full_sweep_matches_scatter_reference(modsim):
    """End-to-end differential: one sweep through the one-hot path vs a
    plain scatter/gather re-evaluation of the same accepted updates.
    The sweep returns its state through AtomTable/M/R; the reference
    recomputes M' and the residual R' directly from the sweep's own
    atom-table delta (mass-per-element difference), which must agree
    exactly if and only if every table write and matrix update addressed
    the intended slots."""
    from cogaps_tpu.engine import prepare_device_data
    from cogaps_tpu.models import dense
    from cogaps_tpu.ops import atoms as atoms_mod
    from cogaps_tpu.ops.sweep import make_consts, sweep
    from cogaps_tpu.params import CogapsParams

    D, _, _ = modsim
    cfg = CogapsParams(n_patterns=3, n_iterations=10, seed=0
                       ).engine_config(*D.shape)
    data = prepare_device_data(D, None, cfg)
    consts = make_consts(D.shape[0], D.shape[1], 3, 512, 64, cfg.alpha_a)

    rng = np.random.default_rng(9)
    n0 = 100
    elem = jnp.asarray(
        np.where(np.arange(512) < n0,
                 rng.integers(0, consts.n_bins, 512), -1), jnp.int32)
    mass = jnp.asarray(
        np.where(np.arange(512) < n0, rng.gamma(2.0, 1.0, 512), 0.0),
        jnp.float32)
    atoms = atoms_mod.AtomTable(mass=mass, elem=elem,
                                n=jnp.asarray(n0, jnp.int32))
    M = jnp.zeros((D.shape[0], 3), jnp.float32)
    # M consistent with atom table (mass-sum per element)
    M = atoms_mod.total_mass_per_element(atoms, consts.n_bins).reshape(
        D.shape[0], 3)
    other = jnp.asarray(rng.gamma(2.0, 1.0, (D.shape[1], 3)), jnp.float32)
    phase = dense.make_phase(data.invS2, other)
    model = dense.make_model(phase, data.invS2)
    cache = dense.rebuild_cache(data.D, data.invS2, M, other)

    atoms2, M2, cache2, n_proc, counts = sweep(
        jax.random.PRNGKey(3), atoms, M, cache, jnp.float32(1.0),
        jnp.asarray(10**9, jnp.int32), consts, data.mass_a, model=model)
    assert int(n_proc) > 0
    assert int(counts.processed.sum()) == int(n_proc)
    assert (np.asarray(counts.accepted) <= np.asarray(counts.processed)).all()

    # scatter/gather reference: M' from the table's own mass-per-element
    M_ref = atoms_mod.total_mass_per_element(atoms2, consts.n_bins).reshape(
        D.shape[0], 3)
    np.testing.assert_allclose(np.asarray(M2), np.asarray(M_ref),
                               rtol=1e-5, atol=1e-5)
    # live-atom count bookkeeping + the compact-table invariant
    elem2_h = np.asarray(atoms2.elem)
    n2 = int(atoms2.n)
    assert n2 == int(np.sum(elem2_h >= 0))
    assert (elem2_h[:n2] >= 0).all() and (elem2_h[n2:] == -1).all()
    # incremental Y cache = exact rebuild at the new state
    cache_ref = dense.rebuild_cache(data.D, data.invS2, M2, other)
    np.testing.assert_allclose(np.asarray(cache2.Y),
                               np.asarray(cache_ref.Y),
                               rtol=1e-3, atol=1e-3)
