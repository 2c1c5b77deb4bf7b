"""TPU-resident atomic domain.

The reference stores atoms of the 2^64-position 1-D domain in a sorted
map + unsorted vector with cached neighbor pointers
(reference: src/atomic/AtomicDomain.{h,cpp}, ConcurrentAtomicDomain.{h,cpp}).
That representation is pointer-chasing and inherently serial.

Design delta (same stationary distribution, documented in SURVEY.md §7.1):
every observable statistic of the sampler depends only on which matrix
*element* (bin) an atom occupies and its mass — exact 2^64 positions only
enter through (a) uniform free-position sampling, which at realistic atom
counts is indistinguishable from uniform element sampling (collision
probability ~ n/2^64), and (b) neighbor selection for move/exchange, which
is a *proposal choice*, not part of the target density (positions carry a
uniform prior). We therefore store atoms as a fixed-capacity table of
(element, mass) pairs, compacted so the n live atoms occupy slots [0, n):
uniform atom selection is then a single randint, and insert/erase/compact
are O(capacity) masked scatters — no sorting, no pointers.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AtomTable:
    """Fixed-capacity atom storage, compacted to slots [0, n)."""

    mass: jnp.ndarray  # (capacity,) float32, 0 where empty
    elem: jnp.ndarray  # (capacity,) int32, matrix element index, -1 where empty
    n: jnp.ndarray  # () int32, number of live atoms

    @property
    def capacity(self) -> int:
        return self.mass.shape[0]


def init_atoms(capacity: int) -> AtomTable:
    return AtomTable(
        mass=jnp.zeros((capacity,), jnp.float32),
        elem=jnp.full((capacity,), -1, jnp.int32),
        n=jnp.zeros((), jnp.int32),
    )


def compact(mass: jnp.ndarray, elem: jnp.ndarray, n_new: jnp.ndarray) -> AtomTable:
    """Stable O(capacity) compaction via cumsum + masked scatter: live atoms
    move to slots [0, n) preserving order (determinism contract)."""
    capacity = mass.shape[0]
    valid = elem >= 0
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    scat = jnp.where(valid, pos, capacity)  # out-of-bounds => dropped
    new_mass = jnp.zeros_like(mass).at[scat].set(mass, mode="drop")
    new_elem = jnp.full_like(elem, -1).at[scat].set(elem, mode="drop")
    return AtomTable(mass=new_mass, elem=new_elem, n=n_new)


def total_mass_per_element(atoms: AtomTable, n_elements: int) -> jnp.ndarray:
    """Sum of atom masses per matrix element — the debug 'drift' oracle
    (reference: AsynchronousGibbsSampler.h:237-270 maximumDrift)."""
    scat = jnp.where(atoms.elem >= 0, atoms.elem, n_elements)
    return jnp.zeros((n_elements,), jnp.float32).at[scat].add(atoms.mass, mode="drop")
