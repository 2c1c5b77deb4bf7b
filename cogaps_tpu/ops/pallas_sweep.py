"""Fused Pallas TPU kernel for the dense-model Gibbs update call.

ops/sweep.py expresses one conflict-free proposal sweep as ~25 XLA
gather/scatter ops. On the v5e those lower to serialized custom-call
gathers at ~100-170us EACH inside large programs (round-3 profiling; the
same ops in small isolated programs take ~2us), putting a multi-ms floor
under every sweep regardless of chain count. This kernel runs an ENTIRE
update call — all sweeps of one sampler's GibbsSampler::update(nSteps)
(reference: AsynchronousGibbsSampler.h:89-121) — as one pallas_call with
every table VMEM-resident, so each random access is a small one-hot
matmul on the MXU instead of a serialized gather.

Design rules (shaped by Mosaic's TPU lowering constraints — no scatter
primitive, gathers limited to single-vreg shuffles, no lane<->sublane
reshapes, no cumsum/sort, no jnp.where on BOOLEAN values — use |/& —
and iota must be integer-typed):

  * every per-lane quantity is a (1, B) row vector; ALL arithmetic is
    float32, including indices and counters (exact below 2^24), so no
    integer division or int matmuls are needed;
  * one-hot selectors are built sublane-major — OH[t, i] = (t == idx_i)
    from broadcasted_iota — making every table access a pair of MXU
    matmuls: gather v = ones @ ((t2 .0@0. OHH) * OHL); write
    t2' = t2*(1-hit) + sums with hit/sums = OHH .1@1. OHL contractions;
  * inclusive prefix sums over lanes are (1, B) @ triangular matmuls;
  * factor tables M, Y, SQ are stored transposed as (kp, NRp) planes;
    per-proposal values come from (kp, NRp) @ (NRp, B) one-hot products;
  * the pair term x and the Y-row updates are recomputed from the
    gathered invS2 row and frozen partner columns (models/dense.py:
    Z[r, c, c'] = sum_m o_mc o_mc' invS2[r, m]) — m lives in a
    16-sublane plane, so the recompute is a (mp, NRp) x (NRp, B) matmul
    instead of an n_bins*k-sized table walk;
  * proposal semantics are IDENTICAL to ops/sweep.py (same pre-drawn
    threefry uniforms, same type/selection/accept formulas, same
    first-wins-rows + uncontested-atoms conflict rule, same
    compact-table swap-with-back compaction), so the XLA sweep is this
    kernel's differential oracle (tests/test_pallas_sweep.py runs the
    kernel in interpret mode against it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ..ops import rng as gaps_rng
from ..ops.atoms import AtomTable
from ..ops.sweep import MassParams, SamplerConsts, SweepCounts

LANE = 128
F32 = jnp.float32
# JAX's default matmul precision is bfloat16-class even for f32 operands,
# which silently rounds the integers (indices, counts, lane ranks) and
# f32 table values this formulation moves through matmuls. HIGH runs
# bf16x3 passes on the MXU — 24 mantissa bits, exact for f32 operands —
# at half the cost of HIGHEST (bf16x6, ~f64-class) — but Mosaic only
# lowers DEFAULT and HIGHEST, so HIGHEST it is.
_PREC = jax.lax.Precision.HIGHEST
EPS = float(gaps_rng.EPSILON)
_SQRT2 = 1.4142135623730951


def _erf(x):
    # Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7) — scalar literals only
    # (Mosaic lowers neither lax.erf nor jax.scipy's table-based ndtr;
    # the reference itself inverts 3001/5001-entry lookup tables,
    # src/math/Random.cpp:269-295, so this is strictly more accurate)
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                * t - 0.284496736) * t + 0.254829592) * t * jnp.exp(-z * z)
    return s * y


def _erfinv(x):
    # Giles (2010) single-precision branchless-ish rational approximation
    xc = jnp.clip(x, -0.9999999, 0.9999999)
    w = -jnp.log((1.0 - xc) * (1.0 + xc))
    ws = w - 2.5
    p_a = 2.81022636e-08
    p_a = 3.43273939e-07 + p_a * ws
    p_a = -3.5233877e-06 + p_a * ws
    p_a = -4.39150654e-06 + p_a * ws
    p_a = 0.00021858087 + p_a * ws
    p_a = -0.00125372503 + p_a * ws
    p_a = -0.00417768164 + p_a * ws
    p_a = 0.246640727 + p_a * ws
    p_a = 1.50140941 + p_a * ws
    wb = jnp.sqrt(jnp.maximum(w, 1e-30)) - 3.0
    p_b = -0.000200214257
    p_b = 0.000100950558 + p_b * wb
    p_b = 0.00134934322 + p_b * wb
    p_b = -0.00367342844 + p_b * wb
    p_b = 0.00573950773 + p_b * wb
    p_b = -0.0076224613 + p_b * wb
    p_b = 0.00943887047 + p_b * wb
    p_b = 1.00167406 + p_b * wb
    p_b = 2.83297682 + p_b * wb
    return jnp.where(w < 5.0, p_a, p_b) * xc


def _ndtr(x):
    return 0.5 * (1.0 + _erf(x * F32(1.0 / _SQRT2)))


def _ndtri(q):
    return F32(_SQRT2) * _erfinv(2.0 * q - 1.0)


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _iota0(n, m):
    # tpu.iota only produces integers; cast for the all-f32 arithmetic
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), 0).astype(F32)


def _lane_iota(B):
    return jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(F32)


def _dot0(a, b):
    """Contract dim 0 of both operands: (T, X) .0@0. (T, B) -> (X, B)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32,
                               precision=_PREC)


def _dot1(a, b):
    """Contract dim 1 of both operands: (X, B) .1@1. (Y, B) -> (X, Y)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32,
                               precision=_PREC)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=_PREC)


def _dot1_fast(a, b):
    """Count-only contraction: products are 0/1 and sums are <= B, so
    DEFAULT (single-pass bf16) precision is exact for B <= 256."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)


def _mm_fast(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


class _Tbl:
    """One-hot access to a (T/128, 128)-tiled flat table by (1, B) f32
    indices. `valid` masks lanes for writes/counts."""

    def __init__(self, idx_row, T: int, valid=None):
        B = idx_row.shape[1]
        hi = jnp.floor(idx_row / LANE)
        lo = idx_row - hi * LANE
        self.ohh = (_iota0(T // LANE, B) == hi).astype(F32)
        ohl = (_iota0(LANE, B) == lo).astype(F32)
        if valid is not None:
            v = valid.astype(F32)
            self.ohh = self.ohh * v
            self.ohl = ohl * v
        else:
            self.ohl = ohl

    def gather(self, t2):
        """(1, B) values; 0 for masked lanes."""
        W = _dot0(t2, self.ohh)  # (128, B)
        return _mm(jnp.ones((1, LANE), F32), W * self.ohl)

    def hit(self):
        # occupancy counts are small integers: single-pass precision
        return _dot1_fast(self.ohh, self.ohl)  # (Tc, 128)

    def sums(self, vals):
        return _dot1(self.ohh * vals, self.ohl)

    def set(self, t2, vals):
        return t2 * (1.0 - self.hit()) + self.sums(vals)

    def add(self, t2, vals):
        return t2 + self.sums(vals)


def _trunc_normal(u, a, b, mean, sd):
    sd = jnp.maximum(sd, F32(1e-30))
    p_lower = _ndtr((a - mean) / sd)
    p_upper = _ndtr((b - mean) / sd)
    ok = jnp.logical_not((p_lower > 0.95) | (p_upper < 0.05))
    q = jnp.clip(p_lower + u * (p_upper - p_lower),
                 F32(1e-7), F32(1.0 - 1e-7))
    z = jnp.clip(mean + sd * _ndtri(q), a, b)
    return z.astype(F32), ok


def _gibbs_mass(u, s, s_mu, a, b, lam=None):
    s_safe = jnp.maximum(s, F32(EPS))
    mu = ((s_mu - lam) if lam is not None else s_mu) / s_safe
    sd = jax.lax.rsqrt(s_safe)
    val, ok = _trunc_normal(u, a, b, mu, sd)
    return val, ok & (s > F32(EPS))


def _sweep_once(consts: SamplerConsts, uni, tri, state,
                temp, n_steps_f, lam, mgm, SQ, invS2, other, colnz):
    """One sweep on (1, B) lanes. `state` = (mass2, elem2, M, Y, n_f,
    done_f, c0..c8); mirrors ops/sweep.py `sweep`. All factor/data arrays
    keep their raw shapes — M/Y/SQ (NR, k), invS2 (NR, m), other (m, k) —
    with matmul orientation handled by dot_general contraction dims
    (Mosaic pads to tiles internally)."""
    (mass2, elem2f, M, Y, n_f, done_f, *cs) = state
    NR = consts.n_rows
    B = consts.batch
    C = consts.capacity
    K = consts.k
    NB = consts.n_bins

    u1, u2, u_gibbs, u_exp, u_acc = (uni[j:j + 1] for j in range(5))
    ui0, ui1, ui2, ui3 = (uni[5 + j:6 + j] for j in range(4))
    mm_rank = _mm_fast if B <= 256 else _mm  # exactness bound for bf16

    lane = _lane_iota(B)
    remaining = n_steps_f - done_f
    active = lane < jnp.minimum(remaining, float(B))

    small = n_f < 2.0
    numer = n_f * consts.domain_length
    dp = numer / (numer + consts.alpha * consts.n_bins
                  * (consts.domain_length - n_f))
    is_bd = u1 < 0.5
    is_death = active & is_bd & (u2 < dp) & ~small
    is_birth = active & ((is_bd & (u2 >= dp)) | small)
    is_move = active & ~small & (u1 >= 0.5) & (u1 < 0.75)
    is_exch = active & ~small & (u1 >= 0.75)

    n_c = jnp.maximum(n_f, 1.0)
    a1r = jnp.minimum(jnp.floor(ui0 * n_c), n_c - 1.0)
    n1 = jnp.maximum(n_f - 1.0, 1.0)
    a2rr = jnp.minimum(jnp.floor(ui1 * n1), n1 - 1.0)
    a2r_ = a2rr + (a2rr >= a1r).astype(F32)
    a1c = a1r
    a2c = jnp.minimum(a2r_, n_c - 1.0)
    e_birth = jnp.minimum(jnp.floor(ui2 * NB), float(NB - 1))
    e_move = jnp.minimum(jnp.floor(ui3 * NB), float(NB - 1))

    t_a1 = _Tbl(a1c, C)
    t_a2 = _Tbl(a2c, C)
    elem_a1 = t_a1.gather(elem2f)
    elem_a2 = t_a2.gather(elem2f)
    m1 = jnp.where(is_birth, 0.0, t_a1.gather(mass2))
    m2 = t_a2.gather(mass2)
    elem1 = jnp.where(is_birth, e_birth, jnp.maximum(elem_a1, 0.0))
    elem2_ = jnp.where(is_move, e_move, jnp.maximum(elem_a2, 0.0))
    # float division by k is exactly floor-safe for e < 2^24 (quotient
    # error < 1 ulp never crosses an integer)
    r1 = jnp.floor(elem1 / K)
    c1 = elem1 - r1 * K
    r2 = jnp.floor(elem2_ / K)
    c2 = elem2_ - r2 * K
    uses2 = is_move | is_exch
    uses_a1 = is_death | is_move | is_exch

    # ---- conflict: first-wins rows + uncontested atoms (ops/sweep._keep)
    big = F32(float(B))
    lane_f = jnp.where(active, lane, big)
    ohr1 = (_iota0(NR, B) == r1).astype(F32)
    ohr2 = (_iota0(NR, B) == r2).astype(F32)
    ohr1m = ohr1 * active.astype(F32)
    ohr2m = ohr2 * (active & uses2).astype(F32)
    lmin1 = jnp.min(jnp.where(ohr1m > 0, lane_f, big), axis=1,
                    keepdims=True)
    lmin2 = jnp.min(jnp.where(ohr2m > 0, lane_f, big), axis=1,
                    keepdims=True)
    rmin = jnp.minimum(lmin1, lmin2)  # (NR, 1)
    back1 = _dot0(rmin, ohr1m)  # (1, B); 0 where lane inactive
    back2 = _dot0(rmin, ohr2m)
    # active lanes always have ohr1m column sum 1, so back1 == rmin[r1]
    keep = active & (back1 >= lane_f)
    keep &= ~uses2 | (back2 >= lane_f)

    from ..ops.sweep import atoms_first_wins
    if atoms_first_wins(consts):
        # exact first-wins on atoms: masked min-lane over the (C, B)
        # one-hot (affordable for the tiny P sampler)
        iota_c = _iota0(C, B)
        oha1 = ((iota_c == a1c) & active & uses_a1).astype(F32)
        oha2 = ((iota_c == a2c) & active & is_exch).astype(F32)
        am1 = jnp.min(jnp.where(oha1 > 0, lane_f, big), axis=1,
                      keepdims=True)
        am2 = jnp.min(jnp.where(oha2 > 0, lane_f, big), axis=1,
                      keepdims=True)
        amin = jnp.minimum(am1, am2)  # (C, 1)
        aback1 = _dot0(amin, oha1)
        aback2 = _dot0(amin, oha2)
        keep &= ~uses_a1 | (aback1 >= lane_f)
        keep &= ~is_exch | (aback2 >= lane_f)
    else:
        ta1m = _Tbl(a1c, C, active & uses_a1)
        ta2m = _Tbl(a2c, C, active & is_exch)
        acnt = ta1m.hit() + ta2m.hit()
        keep &= ~uses_a1 | (t_a1.gather(acnt) <= 1.0)
        keep &= ~is_exch | (t_a2.gather(acnt) <= 1.0)

    # capacity guard + budget truncation (inclusive prefix via tri)
    pre_birth_rank = mm_rank((keep & is_birth).astype(F32), tri)
    keep &= ~is_birth | (n_f + pre_birth_rank - 1.0 < C)
    rank = mm_rank(keep.astype(F32), tri)
    keep &= rank <= remaining

    is_birth &= keep
    is_death &= keep
    is_move &= keep
    is_exch &= keep

    # ---- alpha parameters from VMEM tables ----
    K_ = consts.k
    m_ = consts.m
    ohc1 = (_iota0(K_, B) == c1).astype(F32)
    ohc2 = (_iota0(K_, B) == c2).astype(F32)
    ones_k = jnp.ones((1, K_), F32)
    ones_m = jnp.ones((1, m_), F32)

    def pg(tbl, ohr, ohc):  # tbl (NR, k): value[i] = tbl[r_i, c_i]
        return _mm(ones_k, _dot0(tbl, ohr) * ohc)

    s1 = pg(SQ, ohr1, ohc1)
    s2 = pg(SQ, ohr2, ohc2)
    smu1 = pg(Y, ohr1, ohc1)
    smu2 = pg(Y, ohr2, ohc2)

    W1 = _dot0(invS2, ohr1)  # (m, B) invS2 row per lane
    o1 = _mm(other, ohc1)  # (m, B) frozen partner column per lane
    o2 = _mm(other, ohc2)
    x = _mm(ones_m, o1 * o2 * W1)
    same_row = (r1 == r2).astype(F32)
    s_pair = s1 + s2 - 2.0 * x * same_row
    smu_pair = smu1 - smu2

    can1 = _mm(colnz, ohc1) > 0.5
    can2 = _mm(colnz, ohc2) > 0.5
    log_u = jnp.log(jnp.maximum(u_acc, F32(1e-37)))
    # dense-model noise floors are 0 (models/dense.py AlphaBatch)
    rel1 = jnp.abs(smu1) > 0.0
    rel_pair = jnp.abs(smu_pair) > 0.0

    # birth lane
    g_mass, g_ok = _gibbs_mass(u_gibbs, s1 * temp, smu1 * temp, 0.0, mgm,
                               lam)
    e_mass = -jnp.log(jnp.maximum(u_exp, F32(1e-30))) / lam
    b_mass = jnp.where(can1, g_mass, e_mass)
    b_has = ~can1 | (g_ok & rel1)
    birth_acc = is_birth & b_has & (b_mass > F32(EPS))

    # death lane
    d_s = s1 * temp
    d_smu = (smu1 + m1 * s1) * temp
    rel_d = jnp.abs(smu1 + m1 * s1) > 0.0
    d_gm, d_gok = _gibbs_mass(u_gibbs, d_s, d_smu, 0.0, mgm, lam)
    rebirth = jnp.where(can1 & d_gok & rel_d, d_gm, m1)
    dll_death = rebirth * (d_smu - d_s * rebirth * 0.5)
    death_rebirth = is_death & (log_u < dll_death)
    death_kill = is_death & ~(log_u < dll_death)

    # move lane
    same_elem = elem1 == elem2_
    p_s = s_pair * temp
    p_smu = smu_pair * temp
    dll_move = -m1 * (p_smu + p_s * m1 * 0.5)
    move_acc = is_move & ~same_elem & (log_u < dll_move)

    # exchange lane
    x_mass, x_ok = _gibbs_mass(u_gibbs, p_s, p_smu, -m1, m2)
    nm1 = m1 + x_mass
    nm2 = m2 - x_mass
    ex_acc = (is_exch & ~same_elem & (can1 | can2) & x_ok & rel_pair
              & (nm1 > F32(EPS)) & (nm2 > F32(EPS)))

    # ---- matrix deltas -> M planes + Y updates ----
    d1 = jnp.where(birth_acc, b_mass, 0.0)
    d1 = jnp.where(death_kill, -m1, d1)
    d1 = jnp.where(death_rebirth, rebirth - m1, d1)
    d1 = jnp.where(move_acc, -m1, d1)
    d1 = jnp.where(ex_acc, nm1 - m1, d1)
    v1m = birth_acc | death_kill | death_rebirth | move_acc | ex_acc
    d2 = jnp.where(move_acc, m1, 0.0)
    d2 = jnp.where(ex_acc, nm2 - m2, d2)
    v2m = move_acc | ex_acc

    for rr, dd, vm, ohr, ohc, oS, W_r0 in (
            (r1, d1, v1m, ohr1, ohc1, o1, W1),
            (r2, d2, v2m, ohr2, ohc2, o2, None)):
        old = pg(M, ohr, ohc)
        actual = jnp.where(vm, jnp.maximum(old + dd, 0.0) - old, 0.0)
        # M[r, c] += actual where (r_i, c_i) hit: (NR, k) outer sums
        M = M + _dot1(ohr * actual, ohc)
        # Y[r, c'] -= actual * Z[r, c, c'] with the Z row recomputed:
        # zrow[c', i] = sum_m other[m, c'] o_c[m] invS2[r, m]
        W_r = W_r0 if W_r0 is not None else _dot0(invS2, ohr)
        zrow = _dot0(other, oS * W_r)  # (k, B)
        Y = Y - _dot1(ohr * actual, zrow)

    # ---- atom table writes + swap-with-back compaction ----
    write_a1 = death_kill | death_rebirth | move_acc | ex_acc
    mass_v1 = jnp.where(death_kill, 0.0,
                        jnp.where(death_rebirth, rebirth,
                                  jnp.where(ex_acc, nm1, m1)))
    elem_v1 = jnp.where(death_kill, -1.0, jnp.where(move_acc, elem2_,
                                                    elem1))

    birth_rank = mm_rank(birth_acc.astype(F32), tri)
    bslot = n_f + birth_rank - 1.0  # < C by the capacity guard

    twa = _Tbl(a1c, C, write_a1)
    twx = _Tbl(a2c, C, ex_acc)
    twb = _Tbl(jnp.where(birth_acc, bslot, 0.0), C, birth_acc)
    mass2 = twa.set(mass2, mass_v1)
    mass2 = twx.set(mass2, nm2)
    mass2 = twb.set(mass2, b_mass)
    elem2f = twa.set(elem2f, elem_v1)
    elem2f = twb.set(elem2f, e_birth)

    n_b = jnp.sum(birth_acc.astype(F32))
    n_d = jnp.sum(death_kill.astype(F32))
    top = n_f + n_b
    n_new = top - n_d

    hole_tab = _Tbl(a1c, C, death_kill).hit()
    t_slot = jnp.minimum(n_new + lane, float(C - 1))
    t_valid = lane < n_d
    t_is_hole = _Tbl(t_slot, C).gather(hole_tab) > 0.5
    t_filler = t_valid & ~t_is_hole
    f_rank = mm_rank(t_filler.astype(F32), tri)
    hole = death_kill & (a1c < n_new)
    h_rank = mm_rank(hole.astype(F32), tri)
    Bp = _rup(B + 2, LANE)
    rank_to_src = _Tbl(jnp.minimum(f_rank, Bp - 1.0), Bp, t_filler).set(
        jnp.zeros((Bp // LANE, LANE), F32), t_slot)
    src = _Tbl(jnp.minimum(h_rank, Bp - 1.0), Bp).gather(rank_to_src)
    tsrc = _Tbl(jnp.minimum(src, float(C - 1)), C)
    fill_elem = tsrc.gather(elem2f)
    fill_mass = tsrc.gather(mass2)
    thw = _Tbl(a1c, C, hole)
    elem2f = thw.set(elem2f, fill_elem)
    mass2 = thw.set(mass2, fill_mass)
    ttc = _Tbl(t_slot, C, t_valid)
    elem2f = ttc.set(elem2f, jnp.full((1, B), -1.0, F32))
    mass2 = ttc.set(mass2, jnp.zeros((1, B), F32))

    n_processed = jnp.sum(keep.astype(F32))
    sums = [jnp.sum(m.astype(F32)) for m in
            (is_birth, is_death, is_move, is_exch, birth_acc,
             death_kill | death_rebirth, move_acc, ex_acc)]
    new_cs = [cs[0] + 1.0] + [c + s for c, s in zip(cs[1:], sums)]
    return (mass2, elem2f, M, Y, n_new, done_f + n_processed, *new_cs)


def _kernel(consts, s_max,
            uni_ref, mass_ref, elem_ref, M_ref, Y_ref, SQ_ref,
            invS2_ref, other_ref, scal_ref,
            omass_ref, oelem_ref, oM_ref, oY_ref, ocnt_ref):
    B = consts.batch

    n0 = scal_ref[0]
    n_steps_f = scal_ref[1]
    temp = scal_ref[2]
    lam = scal_ref[3]
    mgm = scal_ref[4]

    tri = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(F32)
    other = other_ref[:]
    colnz = (jnp.max(other, axis=0, keepdims=True) > 0.0).astype(F32)

    def body(s, carry):
        def do(c):
            uni = uni_ref[pl.ds(s * 16, 16), :]
            return _sweep_once(consts, uni, tri, c, temp, n_steps_f, lam,
                               mgm, SQ_ref[:], invS2_ref[:], other,
                               colnz)

        done_f = carry[5]
        return jax.lax.cond(done_f < n_steps_f, do, lambda c: c, carry)

    zero = F32(0.0)
    init = (mass_ref[:], elem_ref[:], M_ref[:], Y_ref[:],
            n0, zero, zero, zero, zero, zero, zero, zero, zero, zero,
            zero)
    out = jax.lax.fori_loop(0, s_max, body, init)
    (mass2, elem2f, M, Y, n_f, done_f, *cs) = out
    omass_ref[:] = mass2
    oelem_ref[:] = elem2f
    oM_ref[:] = M
    oY_ref[:] = Y
    vals = [n_f, done_f] + list(cs)
    for j, v in enumerate(vals):
        ocnt_ref[j] = v


def run_updates_pallas_full(key, atoms: AtomTable, M, cache, temp,
                            n_steps, consts: SamplerConsts,
                            mass: MassParams, *, phase, invS2, other_M,
                            s_max: int = 48, interpret: bool = False):
    """run_updates_pallas with an outer while_loop so the full n_steps
    budget is always processed even when one kernel call's s_max sweeps
    fall short (Poisson tails). The uniform streams continue the global
    sweep numbering, matching ops/sweep.run_updates exactly."""

    def cond(c):
        return c[0] < n_steps

    def body(c):
        done, off, atoms, M, cache, cnts = c
        a2, M2, c2, d2, ns2, cnt2 = run_updates_pallas(
            key, atoms, M, cache, temp, n_steps - done, consts, mass,
            phase=phase, invS2=invS2, other_M=other_M, s_max=s_max,
            interpret=interpret, sweep_offset=off)
        cnts = SweepCounts(processed=cnts.processed + cnt2.processed,
                           accepted=cnts.accepted + cnt2.accepted)
        return (done + d2, off + ns2, a2, M2, c2, cnts)

    zc = SweepCounts(processed=jnp.zeros((4,), jnp.int32),
                     accepted=jnp.zeros((4,), jnp.int32))
    init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), atoms, M,
            cache, zc)
    done, n_sweeps, atoms, M, cache, cnts = jax.lax.while_loop(
        cond, body, init)
    return atoms, M, cache, done, n_sweeps, cnts


def run_updates_pallas(key, atoms: AtomTable, M, cache, temp, n_steps,
                       consts: SamplerConsts, mass: MassParams, *,
                       phase, invS2, other_M, s_max: int = 48,
                       interpret: bool = False, sweep_offset=None):
    """Drop-in analog of ops/sweep.run_updates for the dense model on one
    device. Returns (atoms, M, cache, done, n_sweeps, counts)."""
    B = consts.batch
    C = consts.capacity

    # pre-draw the identical threefry uniform streams the XLA path uses
    # (run_updates folds the key by global sweep index; each sweep draws
    # one (16, B) block — ops/sweep.py)
    off = jnp.int32(0) if sweep_offset is None else sweep_offset
    keys = jax.vmap(lambda i: jax.random.fold_in(key, off + i))(
        jnp.arange(s_max))
    uni = jax.vmap(lambda k2: jax.random.uniform(k2, (16, B), F32))(keys)
    uni = uni.reshape(s_max * 16, B)

    mass2 = atoms.mass.reshape(C // LANE, LANE)
    elem2 = atoms.elem.astype(F32).reshape(C // LANE, LANE)

    SQ = phase.SQ
    scal = jnp.stack([
        atoms.n.astype(F32),
        n_steps.astype(F32),
        jnp.asarray(temp, F32),
        mass.lam.astype(F32),
        mass.max_gibbs_mass.astype(F32),
    ])

    kern = functools.partial(_kernel, consts, s_max)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    NR = consts.n_rows
    K = consts.k
    out_shapes = (
        jax.ShapeDtypeStruct((C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((NR, K), F32),
        jax.ShapeDtypeStruct((NR, K), F32),
        jax.ShapeDtypeStruct((16,), F32),
    )
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uni, mass2, elem2, M, cache.Y, SQ, invS2, other_M, scal)
    omass, oelem, oM, oY, ocnt = res

    atoms_out = AtomTable(mass=omass.reshape(C),
                          elem=oelem.astype(jnp.int32).reshape(C),
                          n=ocnt[0].astype(jnp.int32))
    from ..models.dense import DenseCache
    done = ocnt[1].astype(jnp.int32)
    n_sweeps = ocnt[2].astype(jnp.int32)
    counts = SweepCounts(processed=ocnt[3:7].astype(jnp.int32),
                         accepted=ocnt[7:11].astype(jnp.int32))
    return atoms_out, oM, DenseCache(Y=oY), done, n_sweeps, counts


# ----------------------------------------------------------------------
# multi-chain kernel: NCH chains' update calls interleaved in ONE kernel
# ----------------------------------------------------------------------
def _kernel_multi(consts, s_max, NCH,
                  uni_ref, mass_ref, elem_ref, M_ref, Y_ref, SQ_ref,
                  invS2_ref, other_ref, scal_ref,
                  omass_ref, oelem_ref, oM_ref, oY_ref, ocnt_ref):
    """NCH independent chains, python-unrolled inside each sweep step so
    Mosaic's scheduler interleaves their (data-independent) instruction
    DAGs — hiding the per-op latency that dominates a single chain's
    sweep. One core runs all chains either way; interleaving raises unit
    utilization instead of parallelism."""
    B = consts.batch

    tri = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(F32)
    others = [other_ref[ch] for ch in range(NCH)]
    colnzs = [(jnp.max(o, axis=0, keepdims=True) > 0.0).astype(F32)
              for o in others]

    def body(s, carry):
        new = []
        for ch in range(NCH):
            st = carry[ch]
            n_steps_f = scal_ref[ch, 1]

            def do(c, ch=ch):
                uni = uni_ref[ch, pl.ds(s * 16, 16), :]
                return _sweep_once(consts, uni, tri, c, scal_ref[ch, 2],
                                   scal_ref[ch, 1], scal_ref[ch, 3],
                                   scal_ref[ch, 4], SQ_ref[ch],
                                   invS2_ref[ch], others[ch], colnzs[ch])

            new.append(jax.lax.cond(st[5] < n_steps_f, do, lambda c: c,
                                    st))
        return tuple(new)

    zero = F32(0.0)
    init = tuple(
        (mass_ref[ch], elem_ref[ch], M_ref[ch], Y_ref[ch],
         scal_ref[ch, 0], zero, zero, zero, zero, zero, zero, zero, zero,
         zero, zero)
        for ch in range(NCH))
    out = jax.lax.fori_loop(0, s_max, body, init)
    for ch in range(NCH):
        (mass2, elem2f, M, Y, n_f, done_f, *cs) = out[ch]
        omass_ref[ch] = mass2
        oelem_ref[ch] = elem2f
        oM_ref[ch] = M
        oY_ref[ch] = Y
        vals = [n_f, done_f] + list(cs)
        for j, v in enumerate(vals):
            ocnt_ref[ch, j] = v


def run_updates_pallas_multi(keys, atoms: AtomTable, M, cache, temp,
                             n_steps, consts: SamplerConsts,
                             mass: MassParams, *, invS2, other_M,
                             s_max: int = 32, interpret: bool = False,
                             sweep_offsets=None):
    """Batched analog of run_updates_pallas: every array carries a
    leading chain axis; `keys` is (NCH, 2), `n_steps` (NCH,), MassParams
    fields (NCH,). Returns stacked results."""
    NCH = M.shape[0]
    B = consts.batch
    C = consts.capacity

    offs = (jnp.zeros((NCH,), jnp.int32) if sweep_offsets is None
            else sweep_offsets)

    def draw_chain(key, off):
        ks = jax.vmap(lambda i: jax.random.fold_in(key, off + i))(
            jnp.arange(s_max))
        return jax.vmap(lambda k2: jax.random.uniform(k2, (16, B), F32))(
            ks).reshape(s_max * 16, B)

    uni = jax.vmap(draw_chain)(keys, offs)  # (NCH, s_max*16, B)

    mass2 = atoms.mass.reshape(NCH, C // LANE, LANE)
    elem2 = atoms.elem.astype(F32).reshape(NCH, C // LANE, LANE)
    scal = jnp.stack([
        atoms.n.astype(F32),
        n_steps.astype(F32),
        jnp.broadcast_to(jnp.asarray(temp, F32), (NCH,)),
        mass.lam.astype(F32).reshape(NCH),
        mass.max_gibbs_mass.astype(F32).reshape(NCH),
    ], axis=1)  # (NCH, 5)

    kern = functools.partial(_kernel_multi, consts, s_max, NCH)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    NR = consts.n_rows
    K = consts.k
    out_shapes = (
        jax.ShapeDtypeStruct((NCH, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((NCH, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((NCH, NR, K), F32),
        jax.ShapeDtypeStruct((NCH, NR, K), F32),
        jax.ShapeDtypeStruct((NCH, 16), F32),
    )
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uni, mass2, elem2, M, cache.Y, SQ_batched(cache, invS2, other_M),
      invS2, other_M, scal)
    omass, oelem, oM, oY, ocnt = res

    atoms_out = AtomTable(mass=omass.reshape(NCH, C),
                          elem=oelem.astype(jnp.int32).reshape(NCH, C),
                          n=ocnt[:, 0].astype(jnp.int32))
    from ..models.dense import DenseCache
    done = ocnt[:, 1].astype(jnp.int32)
    n_sweeps = ocnt[:, 2].astype(jnp.int32)
    counts = SweepCounts(processed=ocnt[:, 3:7].astype(jnp.int32),
                         accepted=ocnt[:, 7:11].astype(jnp.int32))
    return atoms_out, oM, DenseCache(Y=oY), done, n_sweeps, counts


def SQ_batched(cache, invS2, other_M):
    """SQ = invS2 @ other^2 per chain (the dense phase table)."""
    return jnp.einsum("crm,cmk->crk", invS2, other_M * other_M,
                      precision=jax.lax.Precision.HIGHEST)
