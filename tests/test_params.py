"""Parameter validation (tests/testthat/test_parameters.R +
R/class-CogapsParams.R:131-193 validity rules)."""

import pytest

from cogaps_tpu import CogapsParams


def test_defaults():
    p = CogapsParams()
    assert p.n_iterations == 50000
    assert p.alpha_a == 0.01 and p.alpha_p == 0.01
    assert p.max_gibbs_mass_a == 100.0
    assert p.n_sets == 4
    assert p.resolved_cut() == p.n_patterns
    assert p.resolved_min_ns() == 2
    assert p.resolved_max_ns() == 6


def test_validation_errors():
    with pytest.raises(ValueError):
        CogapsParams(n_patterns=0).validate()
    with pytest.raises(ValueError):
        CogapsParams(n_iterations=0).validate()
    with pytest.raises(ValueError):
        CogapsParams(alpha_a=0.0).validate()
    with pytest.raises(ValueError):
        CogapsParams(distributed="bogus").validate()
    with pytest.raises(ValueError):
        CogapsParams(which_matrix_fixed="A").validate()  # no fixedPatterns


def test_distributed_constraints():
    import numpy as np
    with pytest.raises(ValueError):
        CogapsParams(distributed="single-cell", which_matrix_fixed="P",
                     fixed_patterns=np.ones((4, 3)),
                     explicit_sets=[[0, 1], [2, 3]]).validate()
    with pytest.raises(ValueError):
        CogapsParams(distributed="genome-wide", which_matrix_fixed="A",
                     fixed_patterns=np.ones((4, 3)),
                     explicit_sets=[[0, 1], [2, 3]]).validate()
    # fixed patterns in distributed mode require explicit sets
    with pytest.raises(ValueError):
        CogapsParams(distributed="genome-wide", which_matrix_fixed="P",
                     fixed_patterns=np.ones((4, 3))).validate()


def test_set_param_aliases():
    p = CogapsParams()
    p.set_param("nPatterns", 5)
    assert p.n_patterns == 5
    assert p.get_param("nPatterns") == 5
    with pytest.raises(ValueError):
        p.set_param("nSets", 3)  # must use set_distributed_params
    p.set_distributed_params(6, cut=4, min_ns=3, max_ns=9)
    assert p.n_sets == 6 and p.resolved_min_ns() == 3
