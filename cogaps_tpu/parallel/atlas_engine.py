"""Atlas-scale sparse chain on the DMA sweep kernel (ops/pallas_atlas).

The regime: n_genes x n_samples too large for any VMEM-resident
per-row table (SURVEY.md §7.10; BASELINE.md atlas config). State lives
in HBM:

  * two "vcol" planes (one per sampler) holding the frozen partner
    factor's rows at every nonzero, in the paired 128-lane layout the
    kernel DMAs per proposal (ops/pallas_atlas.py docstring);
  * two M mirrors (factor rows + CSR metadata lanes), updated in place
    by the kernel's accepted-row write-backs;
  * compact atom tables (VMEM inside the kernel, carried between calls).

Per iteration (mirroring the reference's phase structure,
/root/reference/src/gibbs_sampler/SparseNormalModel.cpp:294-311 — the
lookup tables are regenerated whenever the partner factor changed):

  rebuild plane_a from P  ->  A update call  ->
  rebuild plane_p from A  ->  P update call  ->  statistics.

Plane rebuilds are chunked XLA takes (~10 ns/row measured — the ONLY
gather formulation this backend runs at speed; tools/probe_taketput.py)
scanned in place so peak HBM stays plane + one chunk. Statistics reuse
engine.accumulate_stats on factor matrices sliced from the mirrors;
chi^2 uses the closed form with the reconstruction at nonzeros computed
from the freshly rebuilt plane (models/sparse.sparse_chisq semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import (EQUILIBRATION, RunStats, accumulate_stats,
                      derive_hist, init_run_stats)
from ..models.sparse import BETA
from ..ops import rng as gaps_rng
from ..ops.atoms import AtomTable
from ..ops.pallas_atlas import (AtlasParams, MROW_LEN, MROW_NCH,
                                MROW_PROW, DR_LANE, DR2_LANE,
                                run_updates_atlas)
from ..ops.sweep import MassParams, make_consts
from ..params import EngineConfig

LANE = 128
TAKE_CHUNK = 1 << 22  # rows per rebuild take (measured knee, ~21 GB/s)


class AtlasSide(NamedTuple):
    """Static CSR structure of one sampler side (host-built once)."""

    idx: jnp.ndarray        # (nnz_pad,) int32 partner-row id, 0 on pad
    drpack: jnp.ndarray     # (nnz_pad//2, 4) f32 [dr_e, dr2_e, dr_o, dr2_o]
    val: jnp.ndarray        # (nnz_pad,) f32 data values, 0 on pad
    meta: jnp.ndarray       # (NR, 3) f32 [prow, len, nchunks]
    n_rows: int
    nnz_pad: int


def build_side(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               n_rows: int, seg: int) -> AtlasSide:
    """CSR with every row starting at an even nonzero offset (paired
    plane rows never straddle data rows)."""
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_rows).astype(np.int64)
    alens = ((counts + 1) // 2) * 2  # even-aligned lengths
    starts = np.concatenate([[0], np.cumsum(alens)[:-1]])
    nnz_pad = int(alens.sum()) + 2 * seg  # tail pad for overrun DMAs
    idx = np.zeros(nnz_pad, np.int32)
    val = np.zeros(nnz_pad, np.float32)
    pos = starts[rows] + (np.arange(len(rows))
                          - np.concatenate([[0],
                                            np.cumsum(counts)[:-1]]
                                           )[rows])
    idx[pos] = cols.astype(np.int32)
    val[pos] = vals.astype(np.float32)
    dr = np.zeros(nnz_pad, np.float32)
    dr[pos] = 1.0 / vals
    drpack = np.stack([dr[0::2], dr[0::2] ** 2,
                       dr[1::2], dr[1::2] ** 2], axis=1)
    # zero the dr lanes on padding positions (dr already 0 there)
    meta = np.stack([
        (starts // 2).astype(np.float32),
        counts.astype(np.float32),
        np.maximum(1, -(-counts // (2 * seg))).astype(np.float32),
    ], axis=1)
    return AtlasSide(idx=jnp.asarray(idx), drpack=jnp.asarray(drpack),
                     val=jnp.asarray(val), meta=jnp.asarray(meta),
                     n_rows=n_rows, nnz_pad=nnz_pad)


def rebuild_plane(plane, idx_arr, drpack, partner, k: int):
    """plane[j//2, half*64 + c] = partner[idx[j], c]; dr lanes merged.
    Chunked takes + in-place dynamic updates (donated plane). idx_arr /
    drpack are passed as ARGUMENTS (not closed over): baked-in constants
    of this size blow the remote-compile payload limit."""
    m = partner.shape[0]
    pad = jnp.zeros((m, 64 - k), jnp.float32)
    part64 = jnp.concatenate([partner, pad], axis=1)  # (m, 64)
    nnz = idx_arr.shape[0]
    tc = min(TAKE_CHUNK, nnz)
    tc -= tc % 2
    n_chunks = -(-nnz // tc)
    lanei = jnp.arange(128, dtype=jnp.int32)[None, :]
    is_dr = ((lanei == DR_LANE) | (lanei == DR_LANE + 64)).astype(
        jnp.float32)
    is_dr2 = ((lanei == DR2_LANE) | (lanei == DR2_LANE + 64)).astype(
        jnp.float32)
    vmask = ((lanei & 63) < k).astype(jnp.float32)

    def chunk(c, pl_acc):
        j0 = c * tc
        ix = jax.lax.dynamic_slice_in_dim(idx_arr, j0, tc)
        dp = jax.lax.dynamic_slice_in_dim(drpack, j0 // 2,
                                          tc // 2)
        v = jnp.take(part64, ix, axis=0)  # (tc, 64)
        v2 = v.reshape(tc // 2, 128)
        dre = dp[:, 0:1]
        dr2e = dp[:, 1:2]
        dro = dp[:, 2:3]
        dr2o = dp[:, 3:4]
        lo = (lanei < 64).astype(jnp.float32)
        block = (v2 * vmask
                 + is_dr * (dre * lo + dro * (1.0 - lo))
                 + is_dr2 * (dr2e * lo + dr2o * (1.0 - lo)))
        return jax.lax.dynamic_update_slice_in_dim(
            pl_acc, block, j0 // 2, axis=0)

    return jax.lax.fori_loop(0, n_chunks, chunk, plane)


def make_mirror(side: AtlasSide, M0, k: int):
    NR = side.n_rows
    mir = jnp.zeros((NR, 128), jnp.float32)
    mir = mir.at[:, :k].set(M0)
    mir = mir.at[:, MROW_PROW].set(side.meta[:, 0])
    mir = mir.at[:, MROW_LEN].set(side.meta[:, 1])
    mir = mir.at[:, MROW_NCH].set(side.meta[:, 2])
    return mir


class AtlasState(NamedTuple):
    atoms_a: AtomTable
    atoms_p: AtomTable
    mmir_a: jnp.ndarray
    mmir_p: jnp.ndarray
    plane_a: jnp.ndarray
    plane_p: jnp.ndarray


class AtlasEngine:
    """Single-chain atlas engine on one device. coo: io.h5.CooMatrix
    (genes x samples), never densified."""

    def __init__(self, coo, config: EngineConfig, batch: int = 512,
                 group: int = 32, seg: int = 96,
                 capacity: Optional[int] = None, s_max: int = 64,
                 chisq_every: int = 8,
                 interpret: Optional[bool] = None):
        G, S = coo.shape
        k = config.n_patterns
        if k > 60:
            raise ValueError("atlas kernel supports k <= 60")
        self.n_genes, self.n_samples = G, S
        self.config = config
        self.hist = derive_hist(config)
        self.k = k
        self.s_max = s_max
        self.chisq_every = chisq_every
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)

        rows = np.asarray(coo.rows, np.int64)
        cols = np.asarray(coo.cols, np.int64)
        vals = np.asarray(coo.vals, np.float32)
        self.side_a = build_side(rows.astype(np.int32),
                                 cols.astype(np.int32), vals, G, seg)
        self.side_p = build_side(cols.astype(np.int32),
                                 rows.astype(np.int32), vals, S, seg)
        nnz_mean = float(vals.mean()) if len(vals) else 1.0
        lam_a = float(config.alpha_a) * float(np.sqrt(k / nnz_mean))
        lam_p = float(config.alpha_p) * float(np.sqrt(k / nnz_mean))
        self.mass_a = MassParams(jnp.float32(lam_a),
                                 jnp.float32(config.max_gibbs_mass_a
                                             / lam_a))
        self.mass_p = MassParams(jnp.float32(lam_p),
                                 jnp.float32(config.max_gibbs_mass_p
                                             / lam_p))
        cap = capacity or (1 << 19)
        self.consts_a = make_consts(G, S, k, cap, batch, config.alpha_a)
        self.consts_p = make_consts(S, G, k, cap, batch, config.alpha_p)
        self.ap_a = AtlasParams(group=group, seg=seg,
                                prows=self.side_a.nnz_pad // 2)
        self.ap_p = AtlasParams(group=group, seg=seg,
                                prows=self.side_p.nnz_pad // 2)
        self._arrs = dict(
            idx_a=jax.device_put(self.side_a.idx),
            dr_a=jax.device_put(self.side_a.drpack),
            idx_p=jax.device_put(self.side_p.idx),
            dr_p=jax.device_put(self.side_p.drpack),
            rowid_p=_rowid(self.side_p))
        self._step = jax.jit(
            functools.partial(self._iteration_impl),
            static_argnames=("phase", "with_chisq"),
            donate_argnums=(0,))

    # ------------------------------------------------------------------
    def init_state(self) -> AtlasState:
        k = self.k
        cap = self.consts_a.capacity

        def tbl():
            return AtomTable(mass=jnp.zeros((cap,), jnp.float32),
                             elem=jnp.full((cap,), -1, jnp.int32),
                             n=jnp.zeros((), jnp.int32))

        return AtlasState(
            atoms_a=tbl(), atoms_p=tbl(),
            mmir_a=make_mirror(self.side_a,
                               jnp.zeros((self.n_genes, k)), k),
            mmir_p=make_mirror(self.side_p,
                               jnp.zeros((self.n_samples, k)), k),
            plane_a=jnp.zeros((self.ap_a.prows, 128), jnp.float32),
            plane_p=jnp.zeros((self.ap_p.prows, 128), jnp.float32))

    def init_stats(self) -> RunStats:
        return init_run_stats(self.config, self.n_genes, self.n_samples,
                              self.hist)

    # ------------------------------------------------------------------
    def _iteration_impl(self, state: AtlasState, stats: RunStats,
                        it, seed_key, arrs, *, phase: int,
                        with_chisq: bool):
        cfg = self.config
        k = self.k
        key_it = jax.random.fold_in(jax.random.fold_in(seed_key, phase),
                                    it)
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

        # ---- A phase: plane_a from P, then the A update call ----
        M_p = state.mmir_p[:, :k]
        plane_a = rebuild_plane(state.plane_a, arrs["idx_a"],
                                arrs["dr_a"], M_p, k)
        z2a = jnp.dot(M_p.T, M_p, preferred_element_type=jnp.float32)
        z2pad_a = jnp.zeros((128, 128), jnp.float32
                            ).at[:k, :k].set(z2a)
        colnz_a = jnp.zeros((1, 128), jnp.float32).at[0, :k].set(
            (jnp.max(M_p, axis=0) > 0.0).astype(jnp.float32))
        atoms_a, mmir_a, done_a, ns_a, cnt_a = run_updates_atlas(
            kua,
            state.atoms_a, state.mmir_a, plane_a, z2pad_a, colnz_a,
            temp, n_a, self.consts_a, self.mass_a, self.ap_a,
            s_max=self.s_max, interpret=self.interpret)

        # ---- P phase: plane_p from the updated A ----
        M_a = mmir_a[:, :k]
        plane_p = rebuild_plane(state.plane_p, arrs["idx_p"],
                                arrs["dr_p"], M_a, k)
        z2p = jnp.dot(M_a.T, M_a, preferred_element_type=jnp.float32)
        z2pad_p = jnp.zeros((128, 128), jnp.float32
                            ).at[:k, :k].set(z2p)
        colnz_p = jnp.zeros((1, 128), jnp.float32).at[0, :k].set(
            (jnp.max(M_a, axis=0) > 0.0).astype(jnp.float32))
        atoms_p, mmir_p, done_p, ns_p, cnt_p = run_updates_atlas(
            kup,
            state.atoms_p, state.mmir_p, plane_p, z2pad_p, colnz_p,
            temp, n_p, self.consts_p, self.mass_p, self.ap_p,
            s_max=self.s_max, interpret=self.interpret)
        M_p2 = mmir_p[:, :k]

        new_state = AtlasState(atoms_a=atoms_a, atoms_p=atoms_p,
                               mmir_a=mmir_a, mmir_p=mmir_p,
                               plane_a=plane_a, plane_p=plane_p)

        def chisq_fn():
            if not with_chisq:
                return jnp.float32(0.0)
            # plane_p holds A rows at the P-side nonzeros; dot with the
            # LIVE P rows gives the reconstruction at nonzeros
            Pr = jnp.take(M_p2, arrs["rowid_p"], axis=0)
            pp = plane_p
            dot_e = jnp.sum(pp[:, :k] * Pr, axis=1)
            dot_o = jnp.sum(pp[:, 64:64 + k] * Pr, axis=1)
            dr_e = pp[:, DR_LANE]
            dr_o = pp[:, 64 + DR_LANE]
            me = dr_e > 0.0
            mo = dr_o > 0.0
            zero_part = (jnp.sum(z2p * jnp.dot(
                M_p2.T, M_p2, preferred_element_type=jnp.float32))
                - jnp.sum(jnp.where(me, dot_e * dot_e, 0.0))
                - jnp.sum(jnp.where(mo, dot_o * dot_o, 0.0)))
            nnz_part = (
                jnp.sum(jnp.where(me, (1.0 - dot_e * dr_e) ** 2, 0.0))
                + jnp.sum(jnp.where(mo, (1.0 - dot_o * dr_o) ** 2,
                                    0.0)))
            return BETA * (jnp.maximum(zero_part, 0.0) + nnz_part)

        stats = accumulate_stats(
            cfg, hist=self.hist, phase=phase, it=it, M_a=M_a,
            M_p=M_p2, n_atoms_a=atoms_a.n, n_atoms_p=atoms_p.n,
            done_a=done_a, done_p=done_p, stats=stats,
            chisq_fn=chisq_fn, n_genes=self.n_genes,
            obs_a=(ns_a, cnt_a), obs_p=(ns_p, cnt_p))
        return new_state, stats

    # ------------------------------------------------------------------
    def run_phase(self, state: AtlasState, stats: RunStats, seed_key,
                  phase: int, start_iter: int = 0,
                  stop_iter: Optional[int] = None, progress=None):
        stop = (self.config.n_iterations if stop_iter is None
                else stop_iter)
        of = self.config.output_frequency
        for it in range(start_iter, stop):
            # chi^2 lands in the history only on output_frequency ticks
            # (engine.accumulate_stats); chisq_every further prunes the
            # expensive reconstruction to every Nth tick
            tick = (it + 1) % of == 0
            with_chisq = tick and (((it + 1) // of)
                                   % self.chisq_every == 0)
            state, stats = self._step(
                state, stats, jnp.asarray(it, jnp.int32), seed_key,
                self._arrs, phase=phase, with_chisq=with_chisq)
            if progress is not None:
                progress(phase, it, state)
        return state, stats




def _rowid(side: AtlasSide):
    """Static plane-row -> data-row map (for chi^2 reconstruction)."""
    meta = np.asarray(side.meta)
    lens = meta[:, 1].astype(np.int64)
    alens2 = (lens + 1) // 2
    body = np.repeat(np.arange(side.n_rows, dtype=np.int32),
                     alens2)
    out = np.zeros(side.nnz_pad // 2, np.int32)
    out[: len(body)] = body
    return jnp.asarray(out)


# ----------------------------------------------------------------------
# Checkpointing: the planes are REBUILDABLE from (data, mirrors), so a
# checkpoint stores only atoms + mirrors + stats (~tens of MB at atlas
# scale, not the 11+ GB of planes) — the same "persist the generators,
# not the caches" rule the reference's Archive follows
# (/root/reference/src/GapsRunner.cpp:225-270).
# ----------------------------------------------------------------------
def save_checkpoint(path: str, engine: AtlasEngine, state: AtlasState,
                    stats, phase: int, it: int, seed: int) -> str:
    import numpy as _np
    payload = {
        "magic": _np.int64(0xC0A75A7),
        "phase": _np.int32(phase), "iter": _np.int32(it),
        "seed": _np.int64(seed),
        "n_genes": _np.int64(engine.n_genes),
        "n_samples": _np.int64(engine.n_samples),
        "k": _np.int32(engine.k),
        "am_mass": _np.asarray(state.atoms_a.mass),
        "am_elem": _np.asarray(state.atoms_a.elem),
        "am_n": _np.asarray(state.atoms_a.n),
        "pm_mass": _np.asarray(state.atoms_p.mass),
        "pm_elem": _np.asarray(state.atoms_p.elem),
        "pm_n": _np.asarray(state.atoms_p.n),
        "mmir_a": _np.asarray(state.mmir_a),
        "mmir_p": _np.asarray(state.mmir_p),
    }
    for f in stats._fields:
        payload[f"st_{f}"] = _np.asarray(getattr(stats, f))
    tmp = path + ".tmp"
    _np.savez_compressed(tmp, **payload)
    import os as _os
    _os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def load_checkpoint(path: str, engine: AtlasEngine):
    import numpy as _np
    z = _np.load(path)
    for name, mine in (("n_genes", engine.n_genes),
                       ("n_samples", engine.n_samples),
                       ("k", engine.k)):
        if int(z[name]) != int(mine):
            raise ValueError(f"checkpoint {name}={int(z[name])} does not "
                             f"match engine {name}={mine}")
    state = AtlasState(
        atoms_a=AtomTable(mass=jnp.asarray(z["am_mass"]),
                          elem=jnp.asarray(z["am_elem"]),
                          n=jnp.asarray(z["am_n"])),
        atoms_p=AtomTable(mass=jnp.asarray(z["pm_mass"]),
                          elem=jnp.asarray(z["pm_elem"]),
                          n=jnp.asarray(z["pm_n"])),
        mmir_a=jnp.asarray(z["mmir_a"]),
        mmir_p=jnp.asarray(z["mmir_p"]),
        plane_a=jnp.zeros((engine.ap_a.prows, 128), jnp.float32),
        plane_p=jnp.zeros((engine.ap_p.prows, 128), jnp.float32))
    stats0 = engine.init_stats()
    stats = stats0.replace(**{f: jnp.asarray(z[f"st_{f}"])
                              for f in stats0._fields})
    return (state, stats, int(z["phase"]), int(z["iter"]),
            int(z["seed"]))


def run_atlas(coo, n_patterns: int = 50, n_iterations: int = 2000,
              seed: int = 42, messages: bool = True, **engine_kw):
    """Convenience end-to-end atlas run -> CogapsResult (the analog of
    api.CoGAPS for the atlas regime: single sparse chain, DMA kernel).
    Fixed matrices / distributed consensus are out of scope for this
    engine — use the standard api paths for those."""
    import time as _time
    from ..engine import SAMPLING
    from ..params import CogapsParams
    from ..result import CogapsResult, finalize_statistics

    params = CogapsParams(n_patterns=n_patterns,
                          n_iterations=n_iterations, seed=seed,
                          sparse_optimization=True)
    cfg = params.engine_config(coo.shape[0], coo.shape[1])
    eng = AtlasEngine(coo, cfg, **engine_kw)
    state = eng.init_state()
    stats = eng.init_stats()
    key = jax.random.PRNGKey(seed)
    t0 = _time.time()
    for phase in (EQUILIBRATION, SAMPLING):
        if messages:
            print(f"atlas phase {phase}: {n_iterations} iterations",
                  flush=True)
        state, stats = eng.run_phase(state, stats, key, phase)
    stats_h = jax.device_get(stats)
    amean, asd, pmean, psd = finalize_statistics(
        stats_h.a_sum, stats_h.a_sumsq, stats_h.p_sum, stats_h.p_sumsq,
        stats_h.n_stat)
    # meanChiSq over the nonzeros from the P-side structure (never
    # densifies): dot_j = amean[gene_j] . pmean[sample_j]
    ix = np.asarray(eng.side_p.idx)
    rid = np.asarray(_rowid(eng.side_p))
    val = np.asarray(eng.side_p.val)
    live = val > 0
    ga = amean[ix]                       # (nnz_pad, k)
    sa = pmean[np.repeat(rid, 2)[: len(ix)]]
    dot = np.einsum("jk,jk->j", ga, sa)
    z2a = amean.T @ amean
    z2p = pmean.T @ pmean
    from ..models.sparse import BETA as _B
    zero_part = float((z2a * z2p).sum()) - float((dot[live] ** 2).sum())
    nnz_part = float((((1.0 - dot[live] / val[live]) ** 2)).sum())
    mcs = _B * (max(zero_part, 0.0) + nnz_part)
    diagnostics = {
        "meanChiSq": mcs,
        "seed": seed,
        "totalRunningTime": _time.time() - t0,
        "totalUpdates": int(stats_h.upd_hi) * (1 << 30)
        + int(stats_h.upd_lo),
        "chisqHistory": np.asarray(stats_h.chisq_hist),
        "atomHistoryA": np.asarray(stats_h.atom_hist_a),
        "atomHistoryP": np.asarray(stats_h.atom_hist_p),
        "engine": "AtlasEngine",
    }
    k = n_patterns
    return CogapsResult(
        Amean=np.asarray(amean, np.float32),
        Asd=np.asarray(asd, np.float32),
        Pmean=np.asarray(pmean, np.float32),
        Psd=np.asarray(psd, np.float32),
        mean_chi_sq=mcs,
        gene_names=[f"Gene_{i}" for i in range(coo.shape[0])],
        sample_names=[f"Sample_{i}" for i in range(coo.shape[1])],
        pattern_names=[f"Pattern_{i + 1}" for i in range(k)],
        diagnostics=diagnostics)
