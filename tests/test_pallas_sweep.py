"""Differential oracle for the fused Pallas sweep kernel: the XLA sweep
(ops/sweep.py) and the kernel (ops/pallas_sweep.py) implement the same
update-call semantics with the same threefry uniform streams, so on
identical inputs they must produce the same trajectory (up to fp
rounding of the recomputed pair terms). Run in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogaps_tpu.engine import prepare_device_data
from cogaps_tpu.models import dense
from cogaps_tpu.ops.atoms import AtomTable
from cogaps_tpu.ops.pallas_sweep import run_updates_pallas
from cogaps_tpu.ops.sweep import make_consts, run_updates
from cogaps_tpu.params import CogapsParams


@pytest.fixture(scope="module")
def setup(modsim):
    D, _, _ = modsim  # 25 x 20
    cfg = CogapsParams(n_patterns=3, n_iterations=10, seed=0
                       ).engine_config(*D.shape)
    data = prepare_device_data(D, None, cfg)
    consts = make_consts(D.shape[0], D.shape[1], 3, 512, 32, cfg.alpha_a)

    rng = np.random.default_rng(3)
    n0 = 60
    elem = jnp.asarray(
        np.where(np.arange(512) < n0,
                 rng.integers(0, consts.n_bins, 512), -1), jnp.int32)
    mass = jnp.asarray(
        np.where(np.arange(512) < n0, rng.gamma(2.0, 1.0, 512), 0.0),
        jnp.float32)
    atoms = AtomTable(mass=mass, elem=elem, n=jnp.asarray(n0, jnp.int32))
    from cogaps_tpu.ops.atoms import total_mass_per_element
    M = total_mass_per_element(atoms, consts.n_bins).reshape(D.shape[0], 3)
    other = jnp.asarray(rng.gamma(2.0, 1.0, (D.shape[1], 3)), jnp.float32)
    phase = dense.make_phase(data.invS2, other)
    cache = dense.rebuild_cache(data.D, data.invS2, M, other)
    return data, consts, atoms, M, other, phase, cache


def test_kernel_matches_xla_sweep(setup):
    data, consts, atoms, M, other, phase, cache = setup
    key = jax.random.PRNGKey(11)
    n_steps = jnp.asarray(120, jnp.int32)
    temp = jnp.float32(1.0)

    model = dense.make_model(phase, data.invS2)
    a1, M1, c1, done1, ns1, cnt1 = run_updates(
        key, atoms, M, cache, temp, n_steps, consts, data.mass_a,
        model=model)

    a2, M2, c2, done2, ns2, cnt2 = run_updates_pallas(
        key, atoms, M, cache, temp, n_steps, consts, data.mass_a,
        phase=phase, invS2=data.invS2, other_M=other, s_max=32,
        interpret=True)

    assert int(done1) == int(done2) == 120
    assert int(a1.n) == int(a2.n)
    np.testing.assert_array_equal(np.asarray(cnt1.processed),
                                  np.asarray(cnt2.processed))
    np.testing.assert_array_equal(np.asarray(cnt1.accepted),
                                  np.asarray(cnt2.accepted))
    np.testing.assert_array_equal(np.asarray(a1.elem), np.asarray(a2.elem))
    np.testing.assert_allclose(np.asarray(a1.mass), np.asarray(a2.mass),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1.Y), np.asarray(c2.Y),
                               rtol=1e-3, atol=1e-3)


def test_kernel_budget_and_counters(setup):
    data, consts, atoms, M, other, phase, cache = setup
    key = jax.random.PRNGKey(4)
    a2, M2, c2, done2, ns2, cnt2 = run_updates_pallas(
        key, atoms, M, cache, jnp.float32(0.7), jnp.asarray(13, jnp.int32),
        consts, data.mass_a, phase=phase, invS2=data.invS2, other_M=other,
        s_max=16, interpret=True)
    assert int(done2) == 13
    assert int(cnt2.processed.sum()) == 13
    assert (np.asarray(cnt2.accepted) <= np.asarray(cnt2.processed)).all()
    # table stays compact
    elem = np.asarray(a2.elem)
    n = int(a2.n)
    assert (elem[:n] >= 0).all() and (elem[n:] == -1).all()
