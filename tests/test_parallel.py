"""Device-mesh parallelism tests: vmapped multi-chain and gene-sharded
runs on the 8-virtual-CPU-device mesh (conftest) — the analog of the
reference's multi-process tests via BiocParallel forks
(tests/testthat/test_top_level.R:85-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cogaps_tpu.models import dense
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.parallel.multichain import MultichainEngine, stack_device_data
from cogaps_tpu.parallel.sharded import ShardedGapsEngine


def _cfg(D, **kw):
    params = CogapsParams(n_patterns=3, n_iterations=100, seed=3,
                          output_frequency=50, **kw)
    return params.engine_config(*D.shape)


def test_multichain_converges_and_chains_differ(modsim):
    D, _, _ = modsim
    cfg = _cfg(D)
    mesh = Mesh(np.array(jax.devices()[:4]), ("chains",))
    eng = MultichainEngine(stack_device_data([D] * 4, None, cfg), cfg, mesh)
    state, stats = eng.init_state(), eng.init_stats()
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    state, stats = eng.run_phase(state, stats, keys, 0)
    state, stats = eng.run_phase(state, stats, keys, 1)
    hist = np.asarray(stats.chisq_hist)
    assert (hist[:, -1] < 0.5 * hist[:, 0]).all()
    assert len({float(h) for h in hist[:, -1]}) == 4


def test_multichain_matches_single_chain(modsim):
    """A vmapped chain with key k must be bit-identical to the single-chip
    engine run with the same key — vmap is a pure batching transform."""
    from cogaps_tpu.engine import GapsEngine
    D, _, _ = modsim
    cfg = _cfg(D)
    single = GapsEngine(D, None, cfg)
    s_state, s_stats = single.init_state(), single.init_stats()
    key = jax.random.PRNGKey(0)
    s_state, s_stats = single.run_phase(s_state, s_stats, key, 0)

    eng = MultichainEngine(stack_device_data([D] * 2, None, cfg), cfg)
    m_state, m_stats = eng.init_state(), eng.init_stats()
    keys = jnp.stack([jax.random.PRNGKey(0), jax.random.PRNGKey(1)])
    m_state, m_stats = eng.run_phase(m_state, m_stats, keys, 0)
    np.testing.assert_allclose(np.asarray(m_state.M_a[0]),
                               np.asarray(s_state.M_a), rtol=1e-5, atol=1e-5)


def test_sharded_chain_converges(modsim):
    D, _, _ = modsim  # 25 genes -> padded to 28 on 4 devices
    cfg = _cfg(D)
    mesh = Mesh(np.array(jax.devices()[:4]), ("genes",))
    eng = ShardedGapsEngine(D, None, cfg, mesh)
    state, stats = eng.init_state(), eng.init_stats()
    key = jax.random.PRNGKey(3)
    state, stats = eng.run_phase(state, stats, key, 0)
    state, stats = eng.run_phase(state, stats, key, 1)
    hist = np.asarray(stats.chisq_hist)
    assert hist[-1] < 0.5 * hist[0]
    # per-shard atom counts populated on every device
    assert (np.asarray(state.atoms_a.n) > 0).all()
    # padded A rows never gain factor mass (invS2 = 0 rows: only
    # prior-driven atoms can land there, but mass stays finite and the
    # result trims them)
    assert np.isfinite(np.asarray(state.M_a)).all()
    trimmed = eng.trim(np.asarray(state.M_a))
    assert trimmed.shape == (25, 3)


def test_sharded_mass_drift(modsim):
    """Sharded chain: per-shard atom masses must track the sharded factor
    matrix (the drift oracle, AsynchronousGibbsSampler.h:237-270)."""
    from cogaps_tpu.ops.atoms import total_mass_per_element
    D, _, _ = modsim
    cfg = _cfg(D)
    mesh = Mesh(np.array(jax.devices()[:4]), ("genes",))
    eng = ShardedGapsEngine(D, None, cfg, mesh)
    state, stats = eng.init_state(), eng.init_stats()
    key = jax.random.PRNGKey(5)
    state, stats = eng.run_phase(state, stats, key, 0)
    mp = total_mass_per_element(
        jax.device_get(state.atoms_p), D.shape[1] * cfg.n_patterns
    ).reshape(-1, cfg.n_patterns)
    assert float(jnp.max(jnp.abs(mp - jnp.asarray(state.M_p)))) < 0.01


def test_sharded_chisq_matches_manual(modsim):
    D, _, _ = modsim
    cfg = _cfg(D)
    mesh = Mesh(np.array(jax.devices()[:2]), ("genes",))
    eng = ShardedGapsEngine(D, None, cfg, mesh)
    state, stats = eng.init_state(), eng.init_stats()
    key = jax.random.PRNGKey(5)
    state, stats = eng.run_phase(state, stats, key, 0)
    S = np.maximum(0.1 * D, 0.1)
    ap = eng.trim(np.asarray(state.M_a)) @ np.asarray(state.M_p).T
    manual = float(np.sum(((D - ap) / S) ** 2))
    # last filled entry of the equilibration half of the history
    n_hist = stats.chisq_hist.shape[0]
    reported = float(np.asarray(stats.chisq_hist)[n_hist // 2 - 1])
    assert reported == pytest.approx(manual, rel=0.02)


def test_sharded_device_count_invariance(modsim):
    """The determinism contract (the analog of the reference's
    thread-count invariance, tests/testthat/test_seed_consistency.R:
    36-68): same seed => BITWISE the same trajectory on 1, 2, 4 and 8
    devices. Streams are keyed by fixed row-block id, every cross-block
    float reduction is summed in block order, so the device count only
    changes which device owns which block (parallel/sharded.py)."""
    D, _, _ = modsim
    params = CogapsParams(n_patterns=3, n_iterations=120, seed=2,
                          output_frequency=40)
    cfg = params.engine_config(*D.shape)
    results = []
    for nd in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("genes",))
        eng = ShardedGapsEngine(D, None, cfg, mesh, n_blocks=8)
        state, stats = eng.init_state(), eng.init_stats()
        key = jax.random.PRNGKey(9)
        state, stats = eng.run_phase(state, stats, key, 0)
        state, stats = eng.run_phase(state, stats, key, 1)
        st = jax.device_get(state)
        ss = jax.device_get(stats)
        results.append((np.asarray(st.M_a), np.asarray(st.M_p),
                        np.asarray(st.atoms_a.elem),
                        np.asarray(st.atoms_a.mass),
                        np.asarray(st.atoms_a.n),
                        np.asarray(st.atoms_p.elem),
                        np.asarray(ss.chisq_hist)))
    ref = results[0]
    for got, nd in zip(results[1:], (2, 4, 8)):
        for a, b in zip(ref, got):
            # atom histories exactly equal — the reference's own bar
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"n_dev={nd}")
