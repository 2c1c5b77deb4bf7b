"""Runtime debug checks — the analog of the reference's GAPS_DEBUG
assertion layer (reference: src/utils/GapsAssert.h:31-50 plus the
async sampler's postcondition checks: domain sortedness and
maximumDrift < 0.01, AsynchronousGibbsSampler.h:119-121, 237-270).

Enabled with ``CoGAPS(..., debug_checks=True)`` (or ``--debug`` on the
CLI): after every phase the chain state is pulled to the host and
validated. Costs one transfer per phase — for debugging, not production.
"""

from __future__ import annotations

import numpy as np


def check_state(state, n_patterns: int, tol: float = 0.01) -> None:
    """Validate sampler invariants; raises AssertionError on violation."""
    from ..ops.atoms import total_mass_per_element

    for name, atoms, M in (("A", state.atoms_a, state.M_a),
                           ("P", state.atoms_p, state.M_p)):
        elem = np.asarray(atoms.elem)
        n = int(np.asarray(atoms.n).reshape(-1)[0])
        assert n == int((elem >= 0).sum()), (
            f"{name}: live count {n} != live slots {(elem >= 0).sum()}")
        assert (elem[:n] >= 0).all() and (elem[n:] == -1).all(), (
            f"{name}: atom table not compact")
        mass = np.asarray(atoms.mass)
        assert (mass[:n] > 0).all(), f"{name}: non-positive live masses"
        Mh = np.asarray(M)
        assert (Mh >= 0).all(), f"{name}: negative factor entries"
        per_elem = np.asarray(total_mass_per_element(
            atoms, Mh.shape[0] * n_patterns)).reshape(Mh.shape)
        drift = np.abs(per_elem - Mh).max()
        assert drift < tol, (
            f"{name}: atom-mass drift {drift:.4f} exceeds {tol} "
            f"(reference tolerance, AsynchronousGibbsSampler.h:120)")
