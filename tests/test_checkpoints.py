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
