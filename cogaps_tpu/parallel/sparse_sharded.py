"""Gene-sharded sparse-model chain: the atlas-scale configuration
(SURVEY.md §7.10 — 1M cells x 30k genes, k=50, sparse, sharded).

Combines the sparse data model (models/sparse.py — the reference's
SparseNormalModel closed forms, src/gibbs_sampler/SparseNormalModel.cpp:
153-311) with the gene-sharded execution of parallel/sharded.py:

* the genes axis is padded to a device multiple and row-sharded; each
  device holds its ELL row shard (gene-major) AND a sample-major ELL
  rebuilt over its local genes, so no device ever sees the full matrix;
* A sampler — fully local: per-device proposal streams over local bins,
  alpha terms read only the local ELL rows and the replicated P;
* P sampler — replicated proposals; every closed-form term (Z1/Z2 "all
  elements" parts and the nonzero corrections) is additive over genes,
  so the per-device partial alphas are simply psum'd
  (models/sparse.py `make_model(..., axis_name=...)`);
* chi^2 — additive over genes, psum'd in accumulate_stats.

Padding note: the sparse model's implied uncertainty attaches S = 0.1 to
every zero, so padded gene rows are zero OBSERVATIONS rather than exact
no-ops (the dense sharded engine's invS2 = 0 trick has no sparse
analog). At most n_devices - 1 all-zero rows are added; their fitted A
rows shrink to 0 and their likelihood contribution is O(padding/genes) —
negligible at any realistic scale, and exactly zero once the padded A
rows reach 0.

Memory plan at the atlas scale (1M x 30k, k=50, 5% density, 8+ devices):
A shard = (G/ndev, 50) fp32; ELL rows ~ nnz/ndev * 8 bytes; P (30k, 50)
replicated — see `atlas_memory_plan` and the budget test.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import (EQUILIBRATION, HistConfig, RunStats,
                      accumulate_stats, derive_hist, init_run_stats)
from ..models import sparse
from ..ops import rng as gaps_rng
from ..ops.atoms import AtomTable
from ..ops.sweep import MassParams, SamplerConsts, make_consts, run_updates
from ..params import EngineConfig
from ..sparse_engine import SparseChainState

GENE_AXIS = "genes"


def _psum_model(model: sparse.SparseModel, axis_name) -> sparse.SparseModel:
    """Wrap a local sparse model so its alpha terms are summed over the
    gene shards — every term of the closed form is additive over genes
    (reference: SparseNormalModel.cpp:153-292)."""

    def alpha(mstate, M, addr):
        ab = model.alpha(mstate, M, addr)
        s1, smu1, sp, smup, e1, ep = jax.lax.psum(
            (ab.s1, ab.smu1, ab.s_pair, ab.smu_pair, ab.err1,
             ab.err_pair), axis_name)
        from ..models.dense import AlphaBatch
        return AlphaBatch(s1=s1, smu1=smu1, s_pair=sp, smu_pair=smup,
                          err1=e1, err_pair=ep)

    col_nz = (jax.lax.pmax(model.col_nz, axis_name)
              if axis_name is not None else model.col_nz)
    return sparse.SparseModel(col_nz=col_nz, alpha=alpha,
                              apply=model.apply)


def atlas_memory_plan(n_cells: int, n_genes: int, k: int, density: float,
                      n_devices: int) -> dict:
    """Per-device memory budget (bytes) for the atlas configuration —
    the planning artifact for SURVEY.md §7.10."""
    nnz = int(n_cells * n_genes * density)
    g_local = -(-n_cells // n_devices)  # long axis sharded
    ell_rows = nnz // n_devices * 8  # idx int32 + val fp32
    return {
        "A_shard": g_local * k * 4,
        "P_replicated": n_genes * k * 4,
        "ell_gene_major": ell_rows,
        "ell_sample_major": ell_rows,
        "atoms_local": 2 * max(4096, 2 * g_local * k // 4) * 8,
        "total_per_device": (g_local * k * 4 + n_genes * k * 4
                             + 2 * ell_rows
                             + 2 * max(4096, 2 * g_local * k // 4) * 8),
    }


class SparseShardedEngine:
    """One sparse chain, genes axis sharded over `mesh` axis "genes".
    `coo` is an io.h5.CooMatrix (genes x samples) — never densified."""

    def __init__(self, coo, config: EngineConfig, mesh: Mesh):
        if GENE_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{GENE_AXIS}' axis")
        self.mesh = mesh
        n_dev = mesh.shape[GENE_AXIS]
        self.n_dev = n_dev
        G, S = coo.shape
        Gp = -(-G // n_dev) * n_dev
        self.n_genes_orig, self.n_genes, self.n_samples = G, Gp, S
        self.g_local = Gp // n_dev
        self.config = config
        self.hist = derive_hist(config)
        k = config.n_patterns

        rows = np.asarray(coo.rows, np.int64)
        cols = np.asarray(coo.cols, np.int64)
        vals = np.asarray(coo.vals, np.float32)
        nnz_mean = float(vals.mean()) if len(vals) else 1.0
        lam_a = float(config.alpha_a) * float(np.sqrt(k / nnz_mean))
        lam_p = float(config.alpha_p) * float(np.sqrt(k / nnz_mean))
        self.lam_a, self.lam_p = lam_a, lam_p
        self.mass_a = MassParams(jnp.float32(lam_a),
                                 jnp.float32(config.max_gibbs_mass_a / lam_a))
        self.mass_p = MassParams(jnp.float32(lam_p),
                                 jnp.float32(config.max_gibbs_mass_p / lam_p))
        self.data_sparsity = 1.0 - len(vals) / max(G * S, 1)

        # per-shard ELLs: gene-major over local rows (local row ids) and
        # sample-major over local genes; stacked on a leading device axis
        shard = (rows // self.g_local).astype(np.int32)
        ga_idx, ga_val, gp_idx, gp_val = [], [], [], []
        La = Lp = 1
        for d in range(n_dev):
            m = shard == d
            r_loc = (rows[m] - d * self.g_local).astype(np.int32)
            c_loc = cols[m].astype(np.int32)
            v_loc = vals[m]
            ea = sparse.coo_to_ell(r_loc, c_loc, v_loc, self.g_local)
            ep = sparse.coo_to_ell(c_loc, r_loc, v_loc, S)
            ga_idx.append(np.asarray(ea.idx))
            ga_val.append(np.asarray(ea.val))
            gp_idx.append(np.asarray(ep.idx))
            gp_val.append(np.asarray(ep.val))
            La = max(La, ga_idx[-1].shape[1])
            Lp = max(Lp, gp_idx[-1].shape[1])

        def pad_stack(mats, L, fill):
            out = np.full((n_dev, mats[0].shape[0], L), fill,
                          mats[0].dtype)
            for d, m_ in enumerate(mats):
                out[d, :, : m_.shape[1]] = m_
            return jnp.asarray(out)

        self.ell_a_idx = pad_stack(ga_idx, La, -1)
        self.ell_a_val = pad_stack(ga_val, La, 0.0)
        self.ell_p_idx = pad_stack(gp_idx, Lp, -1)
        self.ell_p_val = pad_stack(gp_val, Lp, 0.0)

        self.cap_a_local = max(256, config.capacity_a // n_dev)
        self.consts_a = make_consts(self.g_local, S, k, self.cap_a_local,
                                    config.batch_a, config.alpha_a)
        self.consts_p = make_consts(S, Gp, k, config.capacity_p,
                                    config.batch_p, config.alpha_p,
                                    axis_name=GENE_AXIS)

        ell_spec = P(GENE_AXIS, None, None)
        self.state_spec = SparseChainState(
            atoms_a=AtomTable(mass=P(GENE_AXIS), elem=P(GENE_AXIS),
                              n=P(GENE_AXIS)),
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

        in_specs = ((ell_spec,) * 4, self.state_spec, self.stats_spec,
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
    def _iteration(self, ells, it, state, stats, seed_key, phase):
        cfg = self.config
        ea_idx, ea_val, ep_idx, ep_val = ells
        ell_a = sparse.EllMatrix(idx=ea_idx[0], val=ea_val[0])
        ell_p = sparse.EllMatrix(idx=ep_idx[0], val=ep_val[0])

        key_it = jax.random.fold_in(jax.random.fold_in(seed_key, phase), it)
        kpa, kpp, kua, kup = jax.random.split(key_it, 4)
        kua = jax.random.fold_in(kua, jax.lax.axis_index(GENE_AXIS))

        if phase == EQUILIBRATION:
            temp = jnp.minimum(
                1.0, (2.0 * it.astype(jnp.float32)) / cfg.n_iterations)
        else:
            temp = jnp.float32(1.0)

        n_a = gaps_rng.poisson(
            kpa, jnp.maximum(state.atoms_a.n, 10).astype(jnp.float32))
        n_p = gaps_rng.poisson(
            kpp, jnp.maximum(state.atoms_p.n, 10).astype(jnp.float32))

        atoms_a, M_a = state.atoms_a, state.M_a
        atoms_p, M_p = state.atoms_p, state.M_p

        # A sampler: local rows vs the replicated P
        model_a = sparse.make_model(ell_a, sparse.make_sparse_phase(M_p))
        atoms_a, M_a, _, done_a, ns_a, cnt_a = run_updates(
            kua, atoms_a, M_a, (), temp, n_a, self.consts_a, self.mass_a,
            model=model_a)

        # P sampler: replicated proposals; the local phase tables are
        # built from the LOCAL slice of A, and the per-device partial
        # alpha terms are psum'd (every closed-form term is a sum over
        # genes, so local-tables-then-psum equals global tables)
        phase_p = sparse.make_sparse_phase(M_a)
        model_p = _psum_model(sparse.make_model(ell_p, phase_p),
                              GENE_AXIS)
        atoms_p, M_p, _, done_p, ns_p, cnt_p = run_updates(
            kup, atoms_p, M_p, (), temp, n_p, self.consts_p, self.mass_p,
            model=model_p)

        state = SparseChainState(atoms_a=atoms_a, atoms_p=atoms_p,
                                 M_a=M_a, M_p=M_p)

        def chisq_fn():
            return sparse.sparse_chisq(ell_a, M_a, M_p)

        stats = accumulate_stats(cfg, hist=self.hist, phase=phase, it=it,
                                 M_a=M_a, M_p=M_p,
                                 n_atoms_a=state.atoms_a.n,
                                 n_atoms_p=state.atoms_p.n,
                                 done_a=done_a, done_p=done_p,
                                 stats=stats, chisq_fn=chisq_fn,
                                 n_genes=self.g_local,
                                 axis_name=GENE_AXIS,
                                 obs_a=(ns_a, cnt_a), obs_p=(ns_p, cnt_p))
        return state, stats

    def _phase_local(self, ells, state, stats, seed_key, start, stop, *,
                     phase_static: int):
        state = state.replace(
            atoms_a=state.atoms_a.replace(n=state.atoms_a.n[0]))

        def body(it, carry):
            st, sts = carry
            return self._iteration(ells, it, st, sts, seed_key,
                                   phase_static)

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

    def init_state(self) -> SparseChainState:
        k = self.config.n_patterns
        state = SparseChainState(
            atoms_a=AtomTable(
                mass=jnp.zeros((self.cap_a_local * self.n_dev,),
                               jnp.float32),
                elem=jnp.full((self.cap_a_local * self.n_dev,), -1,
                              jnp.int32),
                n=jnp.zeros((self.n_dev,), jnp.int32)),
            atoms_p=AtomTable(
                mass=jnp.zeros((self.config.capacity_p,), jnp.float32),
                elem=jnp.full((self.config.capacity_p,), -1, jnp.int32),
                n=jnp.zeros((), jnp.int32)),
            M_a=jnp.zeros((self.n_genes, k), jnp.float32),
            M_p=jnp.zeros((self.n_samples, k), jnp.float32))
        return self._put(state, self.state_spec)

    def init_stats(self) -> RunStats:
        stats = init_run_stats(self.config, self.n_genes, self.n_samples,
                               self.hist)
        return self._put(stats, self.stats_spec)

    def sharded_ells(self):
        spec = P(GENE_AXIS, None, None)
        return tuple(
            jax.device_put(x, NamedSharding(self.mesh, spec))
            for x in (self.ell_a_idx, self.ell_a_val, self.ell_p_idx,
                      self.ell_p_val))

    # ------------------------------------------------------------------
    def run_phase(self, state, stats, seed_key, phase: int, start_iter=0,
                  stop_iter=None):
        from ..engine import dispatch_spans
        stop = self.config.n_iterations if stop_iter is None else stop_iter
        ells = self.sharded_ells()
        for a, b in dispatch_spans(start_iter, stop,
                                   self.config.dispatch_iters):
            state, stats = self._run_phase[phase](
                ells, state, stats, seed_key,
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
        return state, stats

    def trim(self, arr: np.ndarray) -> np.ndarray:
        return np.asarray(arr)[: self.n_genes_orig]

    # ------------------------------------------------------------------
    # per-shard checkpointing — parity with ShardedEngine/Multichain
    # (the reference checkpoints everything stateful,
    # src/GapsRunner.cpp:225-270; atlas runs are the LONGEST runs, so
    # this path needs it most). The A-sampler atom tables are
    # device-local (elem = local_row * k + c), so resume on a DIFFERENT
    # device count re-bins them through global element ids on the host.
    def save_checkpoint(self, path_prefix: str, state, stats, phase: int,
                        it: int, seed: int) -> str:
        from .multihost import save_sharded_checkpoint
        return save_sharded_checkpoint(
            path_prefix, (state, stats),
            extra={"phase": np.int32(phase), "iter": np.int32(it),
                   "seed": np.int64(seed),
                   "n_dev": np.int32(self.n_dev),
                   "g_local": np.int64(self.g_local),
                   "cap_a_local": np.int64(self.cap_a_local),
                   "n_genes": np.int64(self.n_genes_orig),
                   "n_samples": np.int64(self.n_samples),
                   "k": np.int32(self.config.n_patterns)})

    def load_checkpoint(self, path_prefix: str):
        """Returns (state, stats, phase, iter, seed) re-placed on this
        engine's mesh. The device count may differ from the saving
        run's; A atoms are re-binned to the new gene shards."""
        import glob
        from .multihost import load_sharded_checkpoint
        like = (jax.device_get(self.init_state()),
                jax.device_get(self.init_stats()))
        # stats shapes are device-count independent; state atom tables
        # are not — load raw shards and reassemble by stored metadata
        z = np.load(sorted(glob.glob(f"{path_prefix}.shard*.npz"))[0])
        for name, mine in (("n_genes", self.n_genes_orig),
                           ("n_samples", self.n_samples),
                           ("k", self.config.n_patterns)):
            if int(z[f"extra_{name}"]) != int(mine):
                raise ValueError(
                    f"checkpoint {name}={int(z[f'extra_{name}'])} does "
                    f"not match engine {name}={mine}")
        old_ndev = int(z["extra_n_dev"])
        old_gloc = int(z["extra_g_local"])
        old_cap = int(z["extra_cap_a_local"])
        state, stats = load_sharded_checkpoint(path_prefix, like)
        if old_ndev != self.n_dev:
            state = self._rebin_atoms_a(state, old_ndev, old_gloc,
                                        old_cap)
        return (self._put(state, self.state_spec),
                self._put(stats, self.stats_spec),
                int(z["extra_phase"]), int(z["extra_iter"]),
                int(z["extra_seed"]))

    def _rebin_atoms_a(self, state, old_ndev: int, old_gloc: int,
                       old_cap: int):
        """Re-shard the device-local A atom tables onto this engine's
        device count (host-side; local elem -> global elem -> new local)."""
        k = self.config.n_patterns
        mass = np.asarray(state.atoms_a.mass).reshape(old_ndev, old_cap)
        elem = np.asarray(state.atoms_a.elem).reshape(old_ndev, old_cap)
        ns = np.asarray(state.atoms_a.n).reshape(old_ndev)
        g_elem, g_mass = [], []
        for d in range(old_ndev):
            nd = int(ns[d])
            le = elem[d, :nd].astype(np.int64)
            g_elem.append(le + d * old_gloc * k)  # global element id
            g_mass.append(mass[d, :nd])
        g_elem = (np.concatenate(g_elem) if g_elem
                  else np.zeros(0, np.int64))
        g_mass = (np.concatenate(g_mass) if g_mass
                  else np.zeros(0, np.float32))
        new_mass = np.zeros((self.n_dev, self.cap_a_local), np.float32)
        new_elem = np.full((self.n_dev, self.cap_a_local), -1, np.int32)
        new_n = np.zeros((self.n_dev,), np.int32)
        dev = g_elem // (self.g_local * k)
        loc = g_elem - dev * (self.g_local * k)
        for d in range(self.n_dev):
            m = dev == d
            cnt = int(m.sum())
            if cnt > self.cap_a_local:
                raise ValueError(
                    f"shard {d} needs {cnt} atom slots, capacity is "
                    f"{self.cap_a_local}")
            new_elem[d, :cnt] = loc[m].astype(np.int32)
            new_mass[d, :cnt] = g_mass[m]
            new_n[d] = cnt
        return state.replace(atoms_a=AtomTable(
            mass=new_mass.reshape(-1), elem=new_elem.reshape(-1),
            n=new_n))
