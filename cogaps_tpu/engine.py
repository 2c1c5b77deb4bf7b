"""Algorithm driver: the two-phase annealed Gibbs run.

TPU-native equivalent of the reference's GapsRunner + GapsStatistics
(reference: src/GapsRunner.cpp:273-503, src/GapsStatistics.{h,cpp}):

* two phases (equilibration with annealing temp min(1, 2*iter/N), then
  sampling) of nIterations each (GapsRunner.cpp:285-291, 455-469);
* per-iteration update counts drawn Poisson(max(nAtoms, 10)) per matrix
  (GapsRunner.cpp:293-296);
* update order A -> sync -> P -> sync (GapsRunner.cpp:202-222); our sync
  is a residual transpose, the analog of the AP transpose-copy
  (DenseNormalModel.cpp:20-36);
* posterior statistics with the per-pattern max normalization
  (GapsStatistics.h:130-149): P columns scaled to max 1, A columns scaled
  inversely, accumulated as running sum and sum-of-squares;
* chi-square and atom-count histories every outputFrequency iterations
  (GapsRunner.cpp:160-199), matrix snapshots (GapsRunner.cpp:316-322),
  PUMP counting (GapsStatistics.h:65-126), fixed-matrix mode
  (GapsRunner.cpp:330-350).

The whole phase (all iterations, all sweeps) runs as ONE jitted
lax.fori_loop — no per-iteration dispatch. Everything is vmap-able over
chains.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .models import dense
from .ops import rng as gaps_rng
from .ops.atoms import AtomTable, init_atoms
from .ops.sweep import SamplerConsts, make_consts, run_updates
from .params import EngineConfig

EQUILIBRATION = 0
SAMPLING = 1

_LO_BITS = 30
_LO_MASK = (1 << _LO_BITS) - 1


@struct.dataclass
class ChainState:
    atoms_a: AtomTable
    atoms_p: AtomTable
    M_a: jnp.ndarray  # (nGenes, k)
    M_p: jnp.ndarray  # (nSamples, k)
    R: jnp.ndarray  # (nGenes, nSamples) residual*invS2, A-layout


@struct.dataclass
class RunStats:
    a_sum: jnp.ndarray  # (G, k)
    a_sumsq: jnp.ndarray
    p_sum: jnp.ndarray  # (S, k)
    p_sumsq: jnp.ndarray
    n_stat: jnp.ndarray  # () int32
    pump: jnp.ndarray  # (G, k)
    n_pump: jnp.ndarray  # () int32
    chisq_hist: jnp.ndarray  # (H,) float32
    atom_hist_a: jnp.ndarray  # (H,) int32
    atom_hist_p: jnp.ndarray
    snap_a: jnp.ndarray  # (2*nSnapshots or 0, G, k) [equil | sampling]
    snap_p: jnp.ndarray
    upd_lo: jnp.ndarray  # () int32 — totalUpdates, base-2^30 split
    upd_hi: jnp.ndarray  # () int32


class GapsEngine:
    """Compiled dense-model engine for one dataset.

    Holds device-resident data (D, invS2 and transposes) and the jitted
    phase runner. `D`/`S` are (nGenes, nSamples) float32 numpy arrays;
    S defaults to max(0.1*D, 0.1) (reference: DenseNormalModel.h:73).
    """

    def __init__(self, D: np.ndarray, S: Optional[np.ndarray],
                 config: EngineConfig):
        D = np.asarray(D, np.float32)
        if S is None:
            S = dense.default_uncertainty(D)
        S = np.asarray(S, np.float32)
        if S.shape != D.shape:
            raise ValueError("uncertainty shape must match data shape")
        if np.any(S <= 0):
            raise ValueError("uncertainty must be strictly positive")
        if np.any(D < 0):
            raise ValueError("negative values in data matrix")
        self.n_genes, self.n_samples = D.shape
        self.config = config
        k = config.n_patterns
        if k >= min(self.n_genes, self.n_samples) and min(self.n_genes, self.n_samples) > 1:
            # reference rejects nPatterns > dims (R/HelperFunctions.R:226-230)
            pass

        lam_a = dense.compute_lambda(D, config.alpha_a, k)
        lam_p = dense.compute_lambda(D, config.alpha_p, k)
        self.lam_a, self.lam_p = lam_a, lam_p
        self.consts_a: SamplerConsts = make_consts(
            self.n_genes, self.n_samples, k, config.capacity_a, config.batch_a,
            config.alpha_a, lam_a, config.max_gibbs_mass_a / lam_a)
        self.consts_p: SamplerConsts = make_consts(
            self.n_samples, self.n_genes, k, config.capacity_p, config.batch_p,
            config.alpha_p, lam_p, config.max_gibbs_mass_p / lam_p)

        self.D = jnp.asarray(D)
        self.invS2 = jnp.asarray(1.0 / (S * S), jnp.float32)
        self.D_t = self.D.T
        self.invS2_t = self.invS2.T
        self.data_sparsity = float((D == 0).mean())

        self._n_hist = (
            2 * (config.n_iterations // config.output_frequency)
            if config.output_frequency > 0 else 0)
        self._snap_freq = (
            config.n_iterations // config.n_snapshots if config.n_snapshots > 0 else 0)

        self._run_phase = jax.jit(
            functools.partial(self._phase_impl),
            static_argnames=("phase",),
        )

    # ------------------------------------------------------------------
    def init_state(self, fixed_patterns: Optional[np.ndarray] = None) -> ChainState:
        cfg = self.config
        k = cfg.n_patterns
        M_a = jnp.zeros((self.n_genes, k), jnp.float32)
        M_p = jnp.zeros((self.n_samples, k), jnp.float32)
        if cfg.which_matrix_fixed == "A":
            M_a = jnp.asarray(fixed_patterns, jnp.float32)
        elif cfg.which_matrix_fixed == "P":
            M_p = jnp.asarray(fixed_patterns, jnp.float32)
        R = dense.rebuild_cache(self.D, self.invS2, M_a, M_p).R
        return ChainState(
            atoms_a=init_atoms(cfg.capacity_a),
            atoms_p=init_atoms(cfg.capacity_p),
            M_a=M_a, M_p=M_p, R=R)

    def init_stats(self) -> RunStats:
        cfg = self.config
        G, S, k = self.n_genes, self.n_samples, cfg.n_patterns
        n_snap = 2 * cfg.n_snapshots if cfg.n_snapshots > 0 else 0
        zi = jnp.zeros((), jnp.int32)
        return RunStats(
            a_sum=jnp.zeros((G, k), jnp.float32),
            a_sumsq=jnp.zeros((G, k), jnp.float32),
            p_sum=jnp.zeros((S, k), jnp.float32),
            p_sumsq=jnp.zeros((S, k), jnp.float32),
            n_stat=zi, pump=jnp.zeros((G, k), jnp.float32), n_pump=zi,
            chisq_hist=jnp.zeros((self._n_hist,), jnp.float32),
            atom_hist_a=jnp.zeros((self._n_hist,), jnp.int32),
            atom_hist_p=jnp.zeros((self._n_hist,), jnp.int32),
            snap_a=jnp.zeros((n_snap, G, k), jnp.float32),
            snap_p=jnp.zeros((n_snap, S, k), jnp.float32),
            upd_lo=zi, upd_hi=zi)

    # ------------------------------------------------------------------
    def _iteration(self, it, state: ChainState, stats: RunStats,
                   base_key, phase: int) -> Tuple[ChainState, RunStats]:
        cfg = self.config
        fixed = cfg.which_matrix_fixed

        key_it = jax.random.fold_in(jax.random.fold_in(base_key, phase), it)
        kpa, kpp, kua, kup = jax.random.split(key_it, 4)

        if phase == EQUILIBRATION:
            temp = jnp.minimum(
                1.0, (2.0 * it.astype(jnp.float32)) / cfg.n_iterations)
        else:
            temp = jnp.float32(1.0)

        n_a = gaps_rng.poisson(
            kpa, jnp.maximum(state.atoms_a.n, 10).astype(jnp.float32))
        n_p = gaps_rng.poisson(
            kpp, jnp.maximum(state.atoms_p.n, 10).astype(jnp.float32))

        R = state.R
        if cfg.rebuild_interval > 0:
            R = jax.lax.cond(
                it % cfg.rebuild_interval == 0,
                lambda: dense.rebuild_cache(self.D, self.invS2,
                                            state.M_a, state.M_p).R,
                lambda: R)

        atoms_a, M_a = state.atoms_a, state.M_a
        atoms_p, M_p = state.atoms_p, state.M_p
        done_a = jnp.zeros((), jnp.int32)
        done_p = jnp.zeros((), jnp.int32)

        if fixed != "A":
            phase_a = dense.make_phase(self.invS2, M_p)
            atoms_a, M_a, cache_a, done_a, _ = run_updates(
                kua, atoms_a, M_a, dense.DenseCache(R), phase_a,
                self.invS2, temp, n_a, self.consts_a)
            R = cache_a.R
        if fixed != "P":
            phase_p = dense.make_phase(self.invS2_t, M_a)
            atoms_p, M_p, cache_p, done_p, _ = run_updates(
                kup, atoms_p, M_p, dense.DenseCache(R.T), phase_p,
                self.invS2_t, temp, n_p, self.consts_p)
            R = cache_p.R.T

        state = ChainState(atoms_a=atoms_a, atoms_p=atoms_p,
                           M_a=M_a, M_p=M_p, R=R)

        # totalUpdates accumulation (GapsRunner.cpp:297), 2^30-split counter
        inc = done_a + done_p
        lo = stats.upd_lo + inc
        stats = stats.replace(upd_lo=lo & _LO_MASK,
                              upd_hi=stats.upd_hi + (lo >> _LO_BITS))

        # posterior statistics in the sampling phase
        # (GapsRunner.cpp:299-315, GapsStatistics.h:130-185)
        if phase == SAMPLING:
            if fixed == "A":
                stats = stats.replace(
                    p_sum=stats.p_sum + M_p,
                    p_sumsq=stats.p_sumsq + M_p * M_p,
                    n_stat=stats.n_stat + 1)
            elif fixed == "P":
                stats = stats.replace(
                    a_sum=stats.a_sum + M_a,
                    a_sumsq=stats.a_sumsq + M_a * M_a,
                    n_stat=stats.n_stat + 1)
            else:
                norm = jnp.max(M_p, axis=0)
                norm = jnp.where(norm == 0.0, 1.0, norm)
                q = M_p / norm
                prod = M_a * norm
                stats = stats.replace(
                    p_sum=stats.p_sum + q, p_sumsq=stats.p_sumsq + q * q,
                    a_sum=stats.a_sum + prod,
                    a_sumsq=stats.a_sumsq + prod * prod,
                    n_stat=stats.n_stat + 1)
                if cfg.take_pump_samples:
                    amax = jnp.argmax(M_a, axis=1)
                    stats = stats.replace(
                        pump=stats.pump.at[
                            jnp.arange(self.n_genes), amax].add(1.0),
                        n_pump=stats.n_pump + 1)

        # snapshots (GapsRunner.cpp:316-322); layout [equil block | sampling]
        if self._snap_freq > 0 and (
                cfg.snapshot_phase == "all"
                or (cfg.snapshot_phase == "equilibration" and phase == EQUILIBRATION)
                or (cfg.snapshot_phase == "sampling" and phase == SAMPLING)):
            take = (it + 1) % self._snap_freq == 0
            s_idx = (phase * cfg.n_snapshots + (it + 1) // self._snap_freq - 1)
            s_idx = jnp.where(take, s_idx, stats.snap_a.shape[0])
            stats = stats.replace(
                snap_a=stats.snap_a.at[s_idx].set(M_a, mode="drop"),
                snap_p=stats.snap_p.at[s_idx].set(M_p, mode="drop"))

        # chi^2 / atom-count history every outputFrequency
        # (GapsRunner.cpp:160-199)
        if self._n_hist > 0:
            rec = (it + 1) % cfg.output_frequency == 0
            cs = jax.lax.cond(
                rec,
                lambda: dense.chisq(dense.DenseCache(R), self.invS2),
                lambda: jnp.float32(0.0))
            h_idx = (phase * (self._n_hist // 2)
                     + (it + 1) // cfg.output_frequency - 1)
            h_idx = jnp.where(rec, h_idx, self._n_hist)
            stats = stats.replace(
                chisq_hist=stats.chisq_hist.at[h_idx].set(cs, mode="drop"),
                atom_hist_a=stats.atom_hist_a.at[h_idx].set(
                    state.atoms_a.n, mode="drop"),
                atom_hist_p=stats.atom_hist_p.at[h_idx].set(
                    state.atoms_p.n, mode="drop"))

        return state, stats

    def _phase_impl(self, state: ChainState, stats: RunStats, seed_key,
                    start_iter, stop_iter, phase: int):
        def body(it, carry):
            st, sts = carry
            return self._iteration(it, st, sts, seed_key, phase)

        return jax.lax.fori_loop(start_iter, stop_iter, body, (state, stats))

    # ------------------------------------------------------------------
    def run_phase(self, state, stats, seed_key, phase: int, start_iter=0):
        return self._run_phase(state, stats, seed_key,
                               jnp.asarray(start_iter, jnp.int32),
                               jnp.asarray(self.config.n_iterations, jnp.int32),
                               phase=phase)

    def run_span(self, state, stats, seed_key, phase: int, start_iter, stop_iter):
        """Run iterations [start, stop) of one phase (checkpoint chunking)."""
        return self._run_phase(state, stats, seed_key,
                               jnp.asarray(start_iter, jnp.int32),
                               jnp.asarray(stop_iter, jnp.int32),
                               phase=phase)

    def chisq(self, state: ChainState) -> float:
        return float(dense.chisq(dense.DenseCache(state.R), self.invS2))
