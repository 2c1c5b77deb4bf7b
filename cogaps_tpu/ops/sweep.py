"""Vectorized conflict-free Gibbs proposal sweep.

This is the TPU replacement for the reference's two execution engines:
the sequential proposal loop (reference:
src/gibbs_sampler/SingleThreadedGibbsSampler.h:114-257) and the
ProposalQueue + OpenMP parallel-for machinery
(reference: src/atomic/ProposalQueue.cpp:53-283,
AsynchronousGibbsSampler.h:89-121).

Parallelization argument (same as the reference's, SURVEY.md §2.3 P2): a
proposal at factor element (r, c) reads only D/S/AP row r and partner
column c, and writes only M[r, c] and AP row r. Proposals on *disjoint
rows* therefore commute exactly — the likelihood factorizes across rows
while the partner factor is frozen. The reference builds a serial queue of
such proposals and replays conflicts via RNG rollback
(ProposalQueue.cpp:169-232); we instead draw a wide batch of B candidate
proposals with counter-based RNG, keep each proposal iff no earlier lane
touches its rows or atoms (deterministic first-wins priority), and
evaluate + apply all survivors in one fused step. Like the reference's
queue — which admits whole batches under a single atom-count window
(ProposalQueue.cpp:135-158) — all proposals within a batch use the
batch-start atom count for the birth/death decision.

Execution strategy (see ops/onehot.py): every indexed access is a one-hot
matmul and every prefix count a triangular matmul, because on this TPU a
dynamic gather/scatter/searchsorted HLO costs ~85us serialized while the
equivalent MXU matmul costs ~1us. The sweep contains NO gather, scatter,
sort, or searchsorted ops.

Proposal kernels replicate SingleThreadedGibbsSampler.h exactly at the
element level:
  * type draw: always birth when n < 2; else u1<0.5 splits birth/death by
    deathProb = n*L / (n*L + alpha*nBins*(L-n)); u1<0.75 move, else
    exchange (h:95-111).
  * birth (h:131-149): uniform element; Gibbs mass if the partner column
    is non-zero (else Exp(lambda)); accept when mass > epsilon.
  * death (h:154-188): uniform atom; attempted rebirth with Gibbs mass at
    the atom-removed state; accept rebirth iff log U < m*(s_mu - s*m/2),
    else the atom dies.
  * move (h:192-223): uniform atom relocated to a uniform element
    (design delta: the reference proposes uniformly between domain
    neighbors; both proposals are symmetric w.r.t. the position-uniform
    atomic prior, so the stationary distribution is unchanged — ours
    mixes globally). Same-element moves auto-accept (a no-op here).
  * exchange (h:228-257): Gibbs mass transfer between the atom and a
    partner atom (design delta: partner is a uniform *other* atom rather
    than the domain successor — pair selection is measurable w.r.t. the
    non-resampled state, so the Gibbs step is unchanged). Same-element
    exchanges are ignored (h:242).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import onehot as oh
from ..ops import rng as gaps_rng
from ..ops.atoms import AtomTable


class SamplerConsts(NamedTuple):
    """Static per-sampler constants (trace-time)."""

    n_rows: int  # rows of the factor being sampled (genes for A, samples for P)
    m: int  # reduction length (the other dimension)
    k: int  # n_patterns
    n_bins: int  # n_rows * k
    capacity: int  # atom table capacity
    batch: int  # proposal batch width B
    alpha: float
    domain_length: float  # binLength * nBins with binLength = 2^64 // nBins
    axis_name: object = None  # mesh axis to psum row-reductions over
    # (gene-sharded P sampler, parallel/sharded.py)


class MassParams(NamedTuple):
    """Runtime (possibly per-chain) mass-prior parameters: lambda =
    alpha*sqrt(k/meanNonZero(D)) and maxGibbsMass/lambda (reference:
    DenseNormalModel.h:79-81). Traced scalars so vmapped chains over
    different data subsets keep their own values."""

    lam: jnp.ndarray  # () float32
    max_gibbs_mass: jnp.ndarray  # () float32, already scaled by 1/lambda


class AddrBatch(NamedTuple):
    """Proposal addresses with their one-hot row/column selectors.
    oh_up stacks [r1 | r2] one-hots ((2B, n_rows)); ohc_up stacks
    [c1 | c2] ((2B, k)). Models do all row access through these."""

    r1: jnp.ndarray
    c1: jnp.ndarray
    r2: jnp.ndarray
    c2: jnp.ndarray
    oh_up: jnp.ndarray
    ohc_up: jnp.ndarray


class ApplyBatch(NamedTuple):
    """Accepted matrix deltas: element (rows, cols) changes by deltas,
    with invalid lanes already zeroed in `oh_rows` AND `deltas`."""

    rows: jnp.ndarray  # (2B,) int32
    cols: jnp.ndarray  # (2B,) int32
    deltas: jnp.ndarray  # (2B,) float32 (0 where not applied)
    oh_rows: jnp.ndarray  # (2B, n_rows), zero rows where not applied
    ohc: jnp.ndarray  # (2B, k)


def make_consts(n_rows: int, m: int, k: int, capacity: int, batch: int,
                alpha: float, axis_name=None) -> SamplerConsts:
    n_bins = n_rows * k
    bin_length = (2**64) // n_bins
    return SamplerConsts(
        n_rows=n_rows, m=m, k=k, n_bins=n_bins, capacity=capacity,
        batch=batch, alpha=alpha,
        domain_length=float(bin_length * n_bins), axis_name=axis_name,
    )


def death_prob(n_f32: jnp.ndarray, consts: SamplerConsts) -> jnp.ndarray:
    """deathProb = n*L / (n*L + alpha*nBins*(L-n))
    (reference: SingleThreadedGibbsSampler.h:105-108)."""
    numer = n_f32 * consts.domain_length
    denom = numer + consts.alpha * consts.n_bins * (consts.domain_length - n_f32)
    return numer / denom


def _eq(a, b):
    return a[:, None] == b[None, :]


def sweep(key: jax.Array, atoms: AtomTable, M: jnp.ndarray,
          mstate, temp: jnp.ndarray, remaining: jnp.ndarray,
          consts: SamplerConsts, mass: MassParams, *, model
          ) -> Tuple[AtomTable, jnp.ndarray, object, jnp.ndarray]:
    """One batched proposal sweep. Returns (atoms, M, mstate, n_processed).

    `model` is a trace-time adapter built per update-phase
    (dense.make_model / sparse.make_model) exposing:
      * model.alpha(mstate, M, addr: AddrBatch) -> AlphaBatch
      * model.apply(mstate, upd: ApplyBatch) -> mstate  (cache update)
      * model.col_nz -> (k,) float32 in {0,1}, canUseGibbs per column
    `mstate` is the model's mutable cache pytree (dense: the weighted
    residual; sparse: empty — it has no cache, SparseNormalModel.cpp has
    no AP matrix)."""
    B = consts.batch
    C = consts.capacity
    NR = consts.n_rows
    K = consts.k
    NB = consts.n_bins
    EPS = gaps_rng.EPSILON

    idx = jnp.arange(B, dtype=jnp.int32)
    n = atoms.n

    k_u, k_i = jax.random.split(key, 2)
    us = jax.random.uniform(k_u, (B, 5), jnp.float32)
    u1, u2, u_gibbs, u_exp, u_acc = (us[:, j] for j in range(5))
    ui = jax.random.uniform(k_i, (B, 4), jnp.float32)

    active = idx < jnp.minimum(remaining, B)

    # ---- proposal types (reference: SingleThreadedGibbsSampler.h:95-111) ----
    small = n < 2
    dp = death_prob(n.astype(jnp.float32), consts)
    is_bd = u1 < 0.5
    is_death = active & is_bd & (u2 < dp) & ~small
    is_birth = active & ((is_bd & (u2 >= dp)) | small)
    is_move = active & ~small & (u1 >= 0.5) & (u1 < 0.75)
    is_exch = active & ~small & (u1 >= 0.75)

    # ---- picks ----
    # uniform *ranks* over the n live atoms, mapped to table slots through
    # blocked prefix counts + two-level one-hot selection (atoms may occupy
    # any slots — the table is hole-based, ops/atoms.py)
    n_c = jnp.maximum(n, 1)
    li = oh.live_index(atoms.elem)
    nf = n_c.astype(jnp.float32)
    a1r = jnp.minimum((ui[:, 0] * nf).astype(jnp.int32), n_c - 1)
    n1f = jnp.maximum(n - 1, 1).astype(jnp.float32)
    a2rr = jnp.minimum((ui[:, 1] * n1f).astype(jnp.int32),
                       jnp.maximum(n - 1, 1) - 1)
    a2r_ = a2rr + (a2rr >= a1r).astype(jnp.int32)  # uniform over ranks != a1r
    ref1 = oh.rank_to_slot(li, a1r)
    ref2 = oh.rank_to_slot(li, jnp.minimum(a2r_, n_c - 1))
    a1 = ref1.slot
    a2 = ref2.slot
    e_birth = jnp.minimum((ui[:, 2] * NB).astype(jnp.int32), NB - 1)
    e_move = jnp.minimum((ui[:, 3] * NB).astype(jnp.int32), NB - 1)

    elem_a1 = oh.table_gather_i32(atoms.elem, ref1)
    elem_a2 = oh.table_gather_i32(atoms.elem, ref2)
    elem1 = jnp.where(is_birth, e_birth, jnp.maximum(elem_a1, 0))
    m1 = jnp.where(is_birth, 0.0, oh.table_gather_f32(atoms.mass, ref1))
    elem2 = jnp.where(is_move, e_move, jnp.maximum(elem_a2, 0))
    m2 = oh.table_gather_f32(atoms.mass, ref2)
    r1 = elem1 // K
    c1 = elem1 - r1 * K
    r2 = elem2 // K
    c2 = elem2 - r2 * K
    uses2 = is_move | is_exch
    uses_a1 = is_death | is_move | is_exch

    # ---- conflict resolution: first proposal per row / per atom wins ----
    # (replaces ProposalQueue's mUsedMatrixIndices / mUsedAtoms hash sets,
    #  reference: ProposalQueue.h:58-61, cpp:175-232) — pairwise lane
    #  comparisons, earlier lane wins (no scatter-min)
    conflict = (_eq(r1, r1)
                | (uses2[None, :] & _eq(r1, r2))
                | (uses2[:, None] & _eq(r2, r1))
                | ((uses2[:, None] & uses2[None, :]) & _eq(r2, r2))
                | ((uses_a1[:, None] & uses_a1[None, :]) & _eq(a1, a1))
                | ((uses_a1[:, None] & is_exch[None, :]) & _eq(a1, a2))
                | ((is_exch[:, None] & uses_a1[None, :]) & _eq(a2, a1))
                | ((is_exch[:, None] & is_exch[None, :]) & _eq(a2, a2)))
    conflict &= active[None, :]
    keep = active & oh.first_wins(conflict)

    # capacity guard (conservative pre-rank), then exact budget truncation
    pre_birth_rank = oh.lane_cumsum((keep & is_birth).astype(jnp.float32))
    keep &= jnp.where(is_birth,
                      n.astype(jnp.float32) + pre_birth_rank - 1.0 < C, True)
    rank = oh.lane_cumsum(keep.astype(jnp.float32))
    keep &= rank <= remaining.astype(jnp.float32)

    is_birth &= keep
    is_death &= keep
    is_move &= keep
    is_exch &= keep

    # ---- evaluate alpha parameters for all survivors ----
    oh_up = oh.onehot(jnp.concatenate([r1, r2]), NR)
    ohc_up = oh.onehot(jnp.concatenate([c1, c2]), K)
    addr = AddrBatch(r1=r1, c1=c1, r2=r2, c2=c2, oh_up=oh_up, ohc_up=ohc_up)
    ab = model.alpha(mstate, M, addr)
    can_up = jnp.sum(ohc_up * model.col_nz[None, :], axis=-1) > 0.5
    can1 = can_up[:B]
    can2 = can_up[B:]
    log_u = gaps_rng.log_uniform(u_acc)
    # conditioning guard: a Gibbs draw whose s_mu is below the model's
    # fp32 noise floor is sampled from rounding garbage — treat it like
    # the reference's far-tail OptionalFloat failure (AlphaBatch.err*).
    rel1 = jnp.abs(ab.smu1) > ab.err1
    rel_pair = jnp.abs(ab.smu_pair) > ab.err_pair

    # birth lane (reference: SingleThreadedGibbsSampler.h:131-149)
    b_s = ab.s1 * temp
    b_smu = ab.smu1 * temp
    g_mass, g_ok = gaps_rng.gibbs_mass(u_gibbs, b_s, b_smu, 0.0,
                                       mass.max_gibbs_mass, mass.lam)
    e_mass = gaps_rng.exponential(u_exp, mass.lam)
    b_mass = jnp.where(can1, g_mass, e_mass)
    b_has = jnp.where(can1, g_ok & rel1, True)
    birth_acc = is_birth & b_has & (b_mass > EPS)

    # death lane (h:154-188); withChange(-m1): s_mu' = s_mu + m1*s
    d_s = ab.s1 * temp
    d_smu = (ab.smu1 + m1 * ab.s1) * temp
    rel_d = jnp.abs(ab.smu1 + m1 * ab.s1) > ab.err1
    d_gm, d_gok = gaps_rng.gibbs_mass(u_gibbs, d_s, d_smu, 0.0,
                                      mass.max_gibbs_mass, mass.lam)
    rebirth = jnp.where(can1 & d_gok & rel_d, d_gm, m1)
    dll_death = rebirth * (d_smu - d_s * rebirth * 0.5)
    death_rebirth = is_death & (log_u < dll_death)
    death_kill = is_death & ~(log_u < dll_death)

    # move lane (h:192-223)
    same_elem = elem1 == elem2
    p_s = ab.s_pair * temp
    p_smu = ab.smu_pair * temp
    dll_move = -m1 * (p_smu + p_s * m1 * 0.5)
    move_acc = is_move & ~same_elem & (log_u < dll_move)

    # exchange lane (h:228-257); gibbsMass without lambda, bounds (-m1, m2)
    x_mass, x_ok = gaps_rng.gibbs_mass(u_gibbs, p_s, p_smu, -m1, m2)
    nm1 = m1 + x_mass
    nm2 = m2 - x_mass
    ex_acc = (is_exch & ~same_elem & (can1 | can2) & x_ok & rel_pair
              & (nm1 > EPS) & (nm2 > EPS))

    # ---- apply matrix changes (each element touched at most once; clamped
    # like safelyChangeMatrix, reference: DenseNormalModel.cpp:117-123) ----
    d1 = jnp.where(birth_acc, b_mass, 0.0)
    d1 = jnp.where(death_kill, -m1, d1)
    d1 = jnp.where(death_rebirth, rebirth - m1, d1)
    d1 = jnp.where(move_acc, -m1, d1)
    d1 = jnp.where(ex_acc, nm1 - m1, d1)
    v1 = birth_acc | death_kill | death_rebirth | move_acc | ex_acc
    d2 = jnp.where(move_acc, m1, 0.0)
    d2 = jnp.where(ex_acc, nm2 - m2, d2)
    v2 = move_acc | ex_acc

    up_v = jnp.concatenate([v1, v2])
    up_d = jnp.concatenate([d1, d2])
    old = jnp.sum(oh.matmul(oh_up, M) * ohc_up, axis=-1)
    actual = jnp.where(up_v, jnp.maximum(old + up_d, 0.0) - old, 0.0)
    oh_up_v = oh_up * up_v[:, None].astype(jnp.float32)
    M = M + oh.matmul(oh_up_v.T, ohc_up * actual[:, None])
    upd = ApplyBatch(rows=jnp.concatenate([r1, r2]),
                     cols=jnp.concatenate([c1, c2]),
                     deltas=actual, oh_rows=oh_up_v, ohc=ohc_up)
    mstate = model.apply(mstate, upd)

    # ---- apply atom changes (single fused table write; slots of valid
    # lanes are disjoint by conflict resolution + start-of-sweep free
    # ranks, so the one-hot sums are exact) ----
    write_a1 = death_kill | death_rebirth | move_acc | ex_acc
    mass_v1 = jnp.where(death_kill, 0.0,
                        jnp.where(death_rebirth, rebirth,
                                  jnp.where(ex_acc, nm1, m1)))
    elem_v1 = jnp.where(death_kill, -1, jnp.where(move_acc, elem2, elem1))

    birth_rank = oh.lane_cumsum(birth_acc.astype(jnp.float32))
    bref = oh.free_rank_to_slot(
        li, jnp.maximum(birth_rank.astype(jnp.int32) - 1, 0))

    ref_w = oh.concat_refs(ref1, ref2, bref)
    zeros_b = jnp.zeros((B,), jnp.bool_)
    valid_mass = jnp.concatenate([write_a1, ex_acc, birth_acc])
    vals_mass = jnp.concatenate([mass_v1, nm2, b_mass])
    mass_arr = oh.table_set_f32(atoms.mass, ref_w, valid_mass, vals_mass)
    valid_elem = jnp.concatenate([write_a1, zeros_b, birth_acc])
    vals_elem = jnp.concatenate([elem_v1, jnp.zeros((B,), jnp.int32),
                                 e_birth])
    elem_arr = oh.table_set_i32(atoms.elem, ref_w, valid_elem, vals_elem)

    n_new = (n + jnp.sum(birth_acc.astype(jnp.int32))
             - jnp.sum(death_kill.astype(jnp.int32)))
    atoms = AtomTable(mass=mass_arr, elem=elem_arr, n=n_new)

    n_processed = jnp.sum(keep.astype(jnp.int32))
    return atoms, M, mstate, n_processed


def run_updates(key: jax.Array, atoms: AtomTable, M: jnp.ndarray,
                mstate, temp: jnp.ndarray, n_steps: jnp.ndarray,
                consts: SamplerConsts, mass: MassParams, *, model):
    """Process `n_steps` proposals in batched sweeps — the analog of
    GibbsSampler::update(nSteps, nThreads) (reference:
    AsynchronousGibbsSampler.h:89-121). Progress is guaranteed: the first
    active proposal of every sweep survives conflict resolution."""

    def cond(carry):
        return carry[0] < n_steps

    def body(carry):
        done, i, atoms, M, mstate = carry
        k = jax.random.fold_in(key, i)
        atoms, M, mstate, n_proc = sweep(
            k, atoms, M, mstate, temp, n_steps - done, consts, mass,
            model=model)
        return (done + n_proc, i + 1, atoms, M, mstate)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), atoms, M,
            mstate)
    done, n_sweeps, atoms, M, mstate = jax.lax.while_loop(cond, body, init)
    return atoms, M, mstate, done, n_sweeps
