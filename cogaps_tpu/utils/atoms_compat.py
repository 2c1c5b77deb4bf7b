"""Checkpoint-side atom-table normalization.

The sweep requires a COMPACT atom table (live atoms in slots [0, n) —
ops/atoms.py). Checkpoints written by earlier hole-based versions may
carry holes; normalize on load. Compaction preserves slot order, so a
resumed run is identical to an uninterrupted one whenever the saved table
was already compact (always true for checkpoints written by this
version).
"""

from __future__ import annotations

import numpy as np


def load_table(mass, elem, n):
    from ..ops.atoms import AtomTable
    import jax.numpy as jnp

    mass = np.asarray(mass)
    elem = np.asarray(elem)
    live = elem >= 0
    k = int(live.sum())
    if k and not live[:k].all():  # holes present: stable-compact
        order = np.argsort(~live, kind="stable")
        mass, elem = mass[order], elem[order]
    return AtomTable(mass=jnp.asarray(mass), elem=jnp.asarray(elem),
                     n=jnp.asarray(np.int32(n)))
