"""Gene-sharded single chain: one Gibbs chain over data too large for one
device, sharded along the genes axis with shard_map.

This is the "scale the long axis" parallelism the reference lacks at the
native level (SURVEY.md §5 long-context: its only mechanism is the
subset+consensus scheme). Here ONE chain runs with D, R, A (and their
uncertainties) row-sharded over the mesh axis "genes":

* A sampler — fully local: each device Gibbs-samples its own A-row shard
  against the replicated P (the likelihood factorizes over rows while P is
  frozen, the same argument as ops/sweep.py). Per-device proposal streams
  (key folded with axis_index) over the local bin space.
* P sampler — replicated: every device draws IDENTICAL proposals (same
  key), computes partial row-reductions over its gene shard, and psums
  them (dense.alpha_batch/make_phase axis_name) — the P factor and its
  atom table evolve identically on all devices.
* chi^2 / atom counts — psum'd into replicated history entries.

Collectives per update call (not per sweep): psums of the (S, k) SQ/Y and
(S, k^2) Z conditional tables at phase build (models/dense.py) — tiny on
ICI next to the O(G_local * S) local table builds.

The atlas memory plan (SURVEY.md §7.10): A is G x k fp32 (1M x 50 = 200 MB)
sharded with D; P (30k x 50) replicated.

Semantics note: the A-proposal stream is per-shard (each device proposes
uniformly over its own row range), so results depend on the device count —
the same way the reference's distributed results depend on nSets. The
stationary distribution is unchanged: shards are equal-sized, so bin
selection stays uniform overall, and cross-shard moves/exchanges are
simply never proposed (a valid blocked kernel mixture).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import (ChainState, DeviceData, RunStats, derive_hist,
                      init_run_stats, run_iteration)
from ..models import dense
from ..ops.atoms import AtomTable
from ..ops.sweep import MassParams, make_consts
from ..params import EngineConfig

GENE_AXIS = "genes"


def pad_to_multiple(D: np.ndarray, S: Optional[np.ndarray], n_dev: int):
    """Pad the gene axis to a multiple of n_dev. Padded rows get
    invS2 = 0 downstream ⇒ they are exact no-ops in every likelihood term."""
    G = D.shape[0]
    pad = (-G) % n_dev
    if pad == 0:
        return D, S, G
    D2 = np.concatenate([D, np.zeros((pad, D.shape[1]), D.dtype)], axis=0)
    if S is None:
        S = dense.default_uncertainty(D)
    S2 = np.concatenate([S, np.full((pad, D.shape[1]), 1.0, np.float32)],
                        axis=0)
    return D2, S2, G


def _atom_spec(axis) -> AtomTable:
    return AtomTable(mass=P(axis), elem=P(axis), n=P(axis))


class ShardedGapsEngine:
    """One chain, genes axis sharded over `mesh` axis "genes"."""

    def __init__(self, D: np.ndarray, S: Optional[np.ndarray],
                 config: EngineConfig, mesh: Mesh):
        if GENE_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{GENE_AXIS}' axis")
        self.mesh = mesh
        n_dev = mesh.shape[GENE_AXIS]
        self.n_dev = n_dev
        D = np.asarray(D, np.float32)
        D, S, self.n_genes_orig = pad_to_multiple(D, S, n_dev)
        if S is None:
            S = dense.default_uncertainty(D)
        S = np.asarray(S, np.float32)
        inv = (1.0 / (S * S)).astype(np.float32)
        inv[self.n_genes_orig:] = 0.0  # padded rows contribute nothing

        self.n_genes, self.n_samples = D.shape
        self.g_local = self.n_genes // n_dev
        self.config = config
        self.hist = derive_hist(config)
        k = config.n_patterns

        lam_a = dense.compute_lambda(D[: self.n_genes_orig], config.alpha_a, k)
        lam_p = dense.compute_lambda(D[: self.n_genes_orig], config.alpha_p, k)
        self.lam_a, self.lam_p = lam_a, lam_p
        mass_a = MassParams(jnp.float32(lam_a),
                            jnp.float32(config.max_gibbs_mass_a / lam_a))
        mass_p = MassParams(jnp.float32(lam_p),
                            jnp.float32(config.max_gibbs_mass_p / lam_p))

        # per-device consts: the A sampler sees only its local row shard
        # (local bins, local capacity); the P sampler is replicated with
        # psum reductions over the gene axis.
        self.cap_a_local = max(256, config.capacity_a // n_dev)
        self.consts_a = make_consts(
            self.g_local, self.n_samples, k, self.cap_a_local,
            config.batch_a, config.alpha_a)
        self.consts_p = make_consts(
            self.n_samples, self.n_genes, k, config.capacity_p,
            config.batch_p, config.alpha_p, axis_name=GENE_AXIS)

        Dj = jnp.asarray(D)
        invj = jnp.asarray(inv)
        self.data = DeviceData(D=Dj, invS2=invj, D_t=Dj.T, invS2_t=invj.T,
                               mass_a=mass_a, mass_p=mass_p)

        self.data_spec = DeviceData(
            D=P(GENE_AXIS, None), invS2=P(GENE_AXIS, None),
            D_t=P(None, GENE_AXIS), invS2_t=P(None, GENE_AXIS),
            mass_a=MassParams(P(), P()), mass_p=MassParams(P(), P()))
        # atoms_a.n crosses the shard_map boundary as a (n_dev,) vector
        # (one live count per shard); atoms_p is replicated.
        self.state_spec = ChainState(
            atoms_a=_atom_spec(GENE_AXIS),
            atoms_p=AtomTable(mass=P(None), elem=P(None), n=P()),
            M_a=P(GENE_AXIS, None), M_p=P(None, None))
        self.stats_spec = RunStats(
            a_sum=P(GENE_AXIS, None), a_sumsq=P(GENE_AXIS, None),
            p_sum=P(None, None), p_sumsq=P(None, None),
            n_stat=P(), pump=P(GENE_AXIS, None), n_pump=P(),
            chisq_hist=P(None), atom_hist_a=P(None), atom_hist_p=P(None),
            snap_a=P(None, GENE_AXIS, None), snap_p=P(None, None, None),
            upd_lo=P(), upd_hi=P(),
            prop_counts=P(None, None), acc_counts=P(None, None),
            sweep_counts=P(None))

        in_specs = (self.data_spec, self.state_spec, self.stats_spec,
                    P(None), P(), P())
        out_specs = (self.state_spec, self.stats_spec)
        self._run_phase = {}
        for ph in (0, 1):
            fn = jax.shard_map(
                functools.partial(self._phase_local, phase_static=ph),
                mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False)
            self._run_phase[ph] = jax.jit(fn)

    # ------------------------------------------------------------------
    def _phase_local(self, data, state, stats, seed_key, start, stop,
                     *, phase_static: int):
        """Per-device body: the shared fori_loop over run_iteration with
        the sharded consts (psum collectives fire inside via axis_name).
        atoms_a.n arrives as the local (1,) slice of the per-shard count
        vector — squeeze to the scalar the sweep kernels expect."""
        state = state.replace(
            atoms_a=state.atoms_a.replace(n=state.atoms_a.n[0]))

        def body(it, carry):
            st, sts = carry
            return run_iteration(self.config, self.consts_a, self.consts_p,
                                 self.hist, phase_static, data, it, st, sts,
                                 seed_key)

        state, stats = jax.lax.fori_loop(start, stop, body, (state, stats))
        state = state.replace(
            atoms_a=state.atoms_a.replace(n=state.atoms_a.n[None]))
        return state, stats

    # ------------------------------------------------------------------
    def _put(self, tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x),
                                        NamedSharding(self.mesh, s)),
            tree, specs)

    def init_state(self, fixed_patterns=None) -> ChainState:
        k = self.config.n_patterns
        M_a = jnp.zeros((self.n_genes, k), jnp.float32)
        M_p = jnp.zeros((self.n_samples, k), jnp.float32)
        if self.config.which_matrix_fixed == "A":
            fp = np.zeros((self.n_genes, k), np.float32)
            fp[: self.n_genes_orig] = np.asarray(fixed_patterns, np.float32)
            M_a = jnp.asarray(fp)
        elif self.config.which_matrix_fixed == "P":
            M_p = jnp.asarray(fixed_patterns, jnp.float32)
        state = ChainState(
            atoms_a=AtomTable(
                mass=jnp.zeros((self.cap_a_local * self.n_dev,), jnp.float32),
                elem=jnp.full((self.cap_a_local * self.n_dev,), -1, jnp.int32),
                n=jnp.zeros((self.n_dev,), jnp.int32)),
            atoms_p=AtomTable(
                mass=jnp.zeros((self.config.capacity_p,), jnp.float32),
                elem=jnp.full((self.config.capacity_p,), -1, jnp.int32),
                n=jnp.zeros((), jnp.int32)),
            M_a=M_a, M_p=M_p)
        return self._put(state, self.state_spec)

    def init_stats(self) -> RunStats:
        stats = init_run_stats(self.config, self.n_genes, self.n_samples,
                               self.hist)
        return self._put(stats, self.stats_spec)

    def sharded_data(self) -> DeviceData:
        return self._put(self.data, self.data_spec)

    # ------------------------------------------------------------------
    def run_phase(self, state, stats, seed_key, phase: int, start_iter=0,
                  stop_iter=None) -> Tuple[ChainState, RunStats]:
        from ..engine import dispatch_spans
        stop = self.config.n_iterations if stop_iter is None else stop_iter
        data = self.sharded_data()
        for a, b in dispatch_spans(start_iter, stop,
                                   self.config.dispatch_iters):
            state, stats = self._run_phase[phase](
                data, state, stats, seed_key,
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
        return state, stats

    # ------------------------------------------------------------------
    def trim(self, arr: np.ndarray) -> np.ndarray:
        """Strip gene-axis padding from a gathered result array."""
        return np.asarray(arr)[: self.n_genes_orig]
