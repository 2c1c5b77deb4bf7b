"""Checkpoint/resume contract (tests/testthat/test_checkpoints.R:4-16):
run with checkpointing, resume from a mid-run checkpoint with a *different*
seed argument => identical factors."""

import os
import shutil

import numpy as np

from cogaps_tpu import CoGAPS


def test_checkpoint_resume_exact(tmp_path, modsim):
    D, _, _ = modsim
    out = str(tmp_path / "gaps_checkpoint.out")

    # full run with checkpointing every 50 iterations; grab the mid-sampling
    # checkpoint left on disk partway through by copying at the end (the
    # last write happens at sampling iteration 150 of 200)
    r1 = CoGAPS(D, n_patterns=3, n_iterations=200, seed=42, messages=False,
                checkpoint_interval=50, checkpoint_out_file=out)
    assert os.path.exists(out)
    mid = str(tmp_path / "mid.ckpt")
    shutil.copy(out, mid)

    # resume with a different seed argument — the checkpoint's seed wins
    # (reference: GapsRunner.cpp:100-106)
    r2 = CoGAPS(D, n_patterns=3, n_iterations=200, seed=999, messages=False,
                checkpoint_in_file=mid)
    np.testing.assert_array_equal(r1.Amean, r2.Amean)
    np.testing.assert_array_equal(r1.Pmean, r2.Pmean)
    np.testing.assert_array_equal(r1.Asd, r2.Asd)
    assert r1.mean_chi_sq == r2.mean_chi_sq


def test_checkpointed_equals_uninterrupted(tmp_path, modsim):
    """Chunked execution (checkpoint spans) must not change the trajectory
    relative to a single-span run with the same seed."""
    D, _, _ = modsim
    out = str(tmp_path / "ck.out")
    r1 = CoGAPS(D, n_patterns=3, n_iterations=120, seed=7, messages=False,
                checkpoint_interval=40, checkpoint_out_file=out)
    r2 = CoGAPS(D, n_patterns=3, n_iterations=120, seed=7, messages=False)
    np.testing.assert_array_equal(r1.Amean, r2.Amean)
    np.testing.assert_array_equal(r1.Pmean, r2.Pmean)


def test_sharded_checkpoint_resume_exact(tmp_path, modsim):
    """Sharded-engine per-shard checkpoint: resume reproduces the
    uninterrupted run EXACTLY, including across a DIFFERENT device
    count (block state is device-count-independent —
    parallel/sharded.py)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from cogaps_tpu.params import CogapsParams
    from cogaps_tpu.parallel.sharded import ShardedGapsEngine

    D, _, _ = modsim
    cfg = CogapsParams(n_patterns=3, n_iterations=60, seed=5,
                       output_frequency=20).engine_config(*D.shape)
    key = jax.random.PRNGKey(5)

    mesh4 = Mesh(np.array(jax.devices()[:4]), ("genes",))
    eng = ShardedGapsEngine(D, None, cfg, mesh4, n_blocks=8)
    state, stats = eng.init_state(), eng.init_stats()
    state, stats = eng.run_phase(state, stats, key, 0, 0, 30)
    path = str(tmp_path / "shck")
    eng.save_checkpoint(path, state, stats, 0, 30, 5)
    state, stats = eng.run_phase(state, stats, key, 0, 30, 60)
    ref = jax.device_get(state)

    # resume on TWO devices from the 4-device checkpoint
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("genes",))
    eng2 = ShardedGapsEngine(D, None, cfg, mesh2, n_blocks=8)
    st2, ss2, phase, it, seed = eng2.load_checkpoint(path)
    assert (phase, it, seed) == (0, 30, 5)
    st2, ss2 = eng2.run_phase(st2, ss2, jax.random.PRNGKey(seed), 0, it,
                              60)
    got = jax.device_get(st2)
    np.testing.assert_array_equal(np.asarray(ref.M_a),
                                  np.asarray(got.M_a))
    np.testing.assert_array_equal(np.asarray(ref.atoms_a.elem),
                                  np.asarray(got.atoms_a.elem))
    np.testing.assert_array_equal(np.asarray(ref.atoms_p.elem),
                                  np.asarray(got.atoms_p.elem))


def test_multichain_checkpoint_resume_exact(tmp_path, modsim):
    """Multichain per-shard checkpoint resume is exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cogaps_tpu.params import CogapsParams
    from cogaps_tpu.parallel.multichain import (MultichainEngine,
                                                stack_device_data)

    D, _, _ = modsim
    cfg = CogapsParams(n_patterns=3, n_iterations=40, seed=3,
                       output_frequency=0).engine_config(*D.shape)
    data = stack_device_data([D] * 3, None, cfg)
    eng = MultichainEngine(data, cfg)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(3) + 3)
    state, stats = eng.init_state(), eng.init_stats()
    state, stats = eng.run_phase(state, stats, keys, 0, 0, 20)
    path = str(tmp_path / "mcck")
    eng.save_checkpoint(path, state, stats, 0, 20, np.arange(3) + 3)
    state, stats = eng.run_phase(state, stats, keys, 0, 20, 40)
    ref = jax.device_get(state)

    eng2 = MultichainEngine(data, cfg)
    st2, ss2, phase, it, seeds = eng2.load_checkpoint(path)
    keys2 = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
    st2, ss2 = eng2.run_phase(st2, ss2, keys2, phase, it, 40)
    got = jax.device_get(st2)
    np.testing.assert_array_equal(np.asarray(ref.M_a),
                                  np.asarray(got.M_a))
    np.testing.assert_array_equal(np.asarray(ref.atoms_a.elem),
                                  np.asarray(got.atoms_a.elem))
