"""Sparse-model engine: the driver specialization for SparseNormalModel.

Same two-phase annealed MCMC as engine.py, with the sparse data model
(models/sparse.py): ELL-layout nonzeros in both orientations, Z1/Z2 lookup
tables regenerated at each sampler sync (reference:
SparseNormalModel.cpp:294-311 via sync, GapsRunner.cpp:202-222), no
residual cache, closed-form chi^2. Custom uncertainty is not supported —
the model's math assumes the implied default (reference:
R/HelperFunctions.R:223-224).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .engine import (EQUILIBRATION, HistConfig, RunStats, accumulate_stats,
                     derive_hist, init_run_stats)
from .models import sparse
from .ops import rng as gaps_rng
from .ops.atoms import AtomTable, init_atoms
from .ops.sweep import MassParams, SamplerConsts, make_consts, run_updates
from .params import EngineConfig


class SparseDeviceData(NamedTuple):
    ell_a: sparse.EllMatrix  # gene-major nonzeros (A-sampler layout)
    ell_p: sparse.EllMatrix  # sample-major nonzeros (P-sampler layout)
    mass_a: MassParams
    mass_p: MassParams
    # dense weight matrices for the fused-kernel table builder
    # (models/sparse.kernel_tables); None when the dense (G x S) weights
    # exceed the fast-path memory bound -> XLA sweep fallback
    Wd_a: object = None  # (G, S) or None
    D1_a: object = None


# dense-weight fast path bound: 2 arrays of this many f32s (the 10k-cell
# scCoGAPS config is ~2e8; atlas-scale stays on the sharded XLA path)
_FAST_PATH_MAX_ELEMS = 250_000_000


@struct.dataclass
class SparseChainState:
    atoms_a: AtomTable
    atoms_p: AtomTable
    M_a: jnp.ndarray  # (nGenes, k)
    M_p: jnp.ndarray  # (nSamples, k)


def run_iteration_sparse(cfg: EngineConfig, consts_a: SamplerConsts,
                         consts_p: SamplerConsts, hist: HistConfig,
                         phase: int, data: SparseDeviceData, it,
                         state: SparseChainState, stats: RunStats,
                         base_key) -> Tuple[SparseChainState, RunStats]:
    """One sparse-model MCMC iteration (GapsRunner.cpp:273-325)."""
    fixed = cfg.which_matrix_fixed
    n_genes = state.M_a.shape[0]

    key_it = jax.random.fold_in(jax.random.fold_in(base_key, phase), it)
    kpa, kpp, kua, kup = jax.random.split(key_it, 4)

    if phase == EQUILIBRATION:
        temp = jnp.minimum(
            1.0, (2.0 * it.astype(jnp.float32)) / cfg.n_iterations)
    else:
        temp = jnp.float32(1.0)

    n_a = gaps_rng.poisson_fast(
        kpa, jnp.maximum(state.atoms_a.n, 10).astype(jnp.float32))
    n_p = gaps_rng.poisson_fast(
        kpp, jnp.maximum(state.atoms_p.n, 10).astype(jnp.float32))

    atoms_a, M_a = state.atoms_a, state.M_a
    atoms_p, M_p = state.atoms_p, state.M_p
    done_a = jnp.zeros((), jnp.int32)
    done_p = jnp.zeros((), jnp.int32)
    obs_a = obs_p = None

    from .engine import _resolve_use_pallas, _pallas_batch
    use_pallas = _resolve_use_pallas(cfg) and data.Wd_a is not None

    def run_upd(k2, atoms, M, n_upd, consts, mparams, ell, Wd, D1,
                other):
        if use_pallas:
            from .ops.pallas_sweep import run_updates_pallas_tables
            ck = consts._replace(batch=_pallas_batch(consts.batch, cfg))
            SQ, Y0, G = sparse.kernel_tables(Wd, D1, other, M)
            atoms, M, done, ns, cnt = run_updates_pallas_tables(
                k2, atoms, M, temp, n_upd, ck, mparams,
                SQ=SQ, Y0=Y0, Z_flat=G, other_M=other,
                s_max=cfg.s_max,
                interpret=jax.default_backend() == "cpu")
            return atoms, M, done, ns, cnt
        model = sparse.make_model(ell, sparse.make_sparse_phase(other))
        atoms, M, _, done, ns, cnt = run_updates(
            k2, atoms, M, (), temp, n_upd, consts, mparams, model=model)
        return atoms, M, done, ns, cnt

    if fixed != "A":
        atoms_a, M_a, done_a, ns_a, cnt_a = run_upd(
            kua, atoms_a, M_a, n_a, consts_a, data.mass_a,
            data.ell_a, data.Wd_a, data.D1_a, M_p)
        obs_a = (ns_a, cnt_a)
    if fixed != "P":
        Wd_p = None if data.Wd_a is None else data.Wd_a.T
        D1_p = None if data.D1_a is None else data.D1_a.T
        atoms_p, M_p, done_p, ns_p, cnt_p = run_upd(
            kup, atoms_p, M_p, n_p, consts_p, data.mass_p,
            data.ell_p, Wd_p, D1_p, M_a)
        obs_p = (ns_p, cnt_p)

    state = SparseChainState(atoms_a=atoms_a, atoms_p=atoms_p,
                             M_a=M_a, M_p=M_p)

    def chisq_fn():
        return sparse.sparse_chisq(data.ell_a, M_a, M_p)

    stats = accumulate_stats(cfg, hist, phase, it, M_a, M_p,
                             state.atoms_a.n, state.atoms_p.n,
                             done_a, done_p, stats, chisq_fn, n_genes,
                             obs_a=obs_a, obs_p=obs_p)
    return state, stats


def _sparse_phase_span(config, consts_a, consts_p, hist, phase, data,
                       state, stats, seed_key, start, stop):
    def body(it, carry):
        st, sts = carry
        return run_iteration_sparse(config, consts_a, consts_p, hist,
                                    phase, data, it, st, sts, seed_key)

    return jax.lax.fori_loop(start, stop, body, (state, stats))


_jit_sparse_phase_span = jax.jit(_sparse_phase_span,
                                 static_argnums=(0, 1, 2, 3, 4))


class SparseGapsEngine:
    """Sparse-model engine with the same surface as GapsEngine."""

    def __init__(self, D, config: EngineConfig):
        """`D` is a dense (genes x samples) array OR an io.h5.CooMatrix —
        the COO path never densifies (atlas-scale ingestion,
        SURVEY.md §7.10)."""
        from .io.h5 import CooMatrix
        if isinstance(D, CooMatrix):
            rows, cols, vals = D.rows, D.cols, D.vals
            self.n_genes, self.n_samples = D.shape
            if np.any(vals < 0):
                raise ValueError("negative values in data matrix")
            nnz_mean = float(vals.mean()) if len(vals) else 1.0
            ell_a = sparse.coo_to_ell(rows, cols, vals, self.n_genes)
            ell_p = sparse.coo_to_ell(cols, rows, vals, self.n_samples)
            self.data_sparsity = 1.0 - len(vals) / max(
                self.n_genes * self.n_samples, 1)
        else:
            D = np.asarray(D, np.float32)
            if np.any(D < 0):
                raise ValueError("negative values in data matrix")
            self.n_genes, self.n_samples = D.shape
            nz = D[D != 0]
            nnz_mean = float(nz.mean()) if nz.size else 1.0
            ell_a = sparse.to_ell(D)
            ell_p = sparse.to_ell(D.T)
            self.data_sparsity = sparse.sparsity(D)
        self.config = config
        self.hist = derive_hist(config)
        k = config.n_patterns

        lam_a = float(config.alpha_a) * float(np.sqrt(k / nnz_mean))
        lam_p = float(config.alpha_p) * float(np.sqrt(k / nnz_mean))
        self.lam_a, self.lam_p = lam_a, lam_p
        if self.n_genes * self.n_samples <= _FAST_PATH_MAX_ELEMS:
            Wd_a, D1_a = sparse.dense_weights(ell_a, self.n_samples)
        else:
            Wd_a = D1_a = None
        self.data = SparseDeviceData(
            ell_a=ell_a,
            ell_p=ell_p,
            mass_a=MassParams(jnp.float32(lam_a),
                              jnp.float32(config.max_gibbs_mass_a / lam_a)),
            mass_p=MassParams(jnp.float32(lam_p),
                              jnp.float32(config.max_gibbs_mass_p / lam_p)),
            Wd_a=Wd_a, D1_a=D1_a)

        self.consts_a = make_consts(self.n_genes, self.n_samples, k,
                                    config.capacity_a, config.batch_a,
                                    config.alpha_a,
                                    local_moves=config.local_moves)
        self.consts_p = make_consts(self.n_samples, self.n_genes, k,
                                    config.capacity_p, config.batch_p,
                                    config.alpha_p,
                                    local_moves=config.local_moves)

        self._run_phase = functools.partial(
            _jit_sparse_phase_span, config, self.consts_a, self.consts_p,
            self.hist)

    # ------------------------------------------------------------------
    def init_state(self, fixed_patterns: Optional[np.ndarray] = None
                   ) -> SparseChainState:
        cfg = self.config
        k = cfg.n_patterns
        M_a = jnp.zeros((self.n_genes, k), jnp.float32)
        M_p = jnp.zeros((self.n_samples, k), jnp.float32)
        if cfg.which_matrix_fixed == "A":
            M_a = jnp.asarray(fixed_patterns, jnp.float32)
        elif cfg.which_matrix_fixed == "P":
            M_p = jnp.asarray(fixed_patterns, jnp.float32)
        return SparseChainState(
            atoms_a=init_atoms(cfg.capacity_a),
            atoms_p=init_atoms(cfg.capacity_p),
            M_a=M_a, M_p=M_p)

    def init_stats(self) -> RunStats:
        return init_run_stats(self.config, self.n_genes, self.n_samples,
                              self.hist)

    # ------------------------------------------------------------------
    def run_phase(self, state, stats, seed_key, phase: int, start_iter=0,
                  progress_cb=None):
        return self.run_span(state, stats, seed_key, phase, start_iter,
                             self.config.n_iterations,
                             progress_cb=progress_cb)

    def run_span(self, state, stats, seed_key, phase: int, start_iter,
                 stop_iter, progress_cb=None):
        from .engine import dispatch_spans
        for a, b in dispatch_spans(start_iter, stop_iter,
                                   self.config.dispatch_iters):
            state, stats = self._run_phase(
                phase, self.data, state, stats, seed_key,
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
            if progress_cb is not None:
                progress_cb(phase, b, state)
        return state, stats

    def chisq(self, state: SparseChainState) -> float:
        return float(sparse.sparse_chisq(self.data.ell_a, state.M_a,
                                         state.M_p))
