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
# JAX's default matmul precision is bfloat16-class even for f32 operands;
# the one-hot formulation moves exact integers (indices, counts, lane
# ranks < 2^24) and f32 table values through matmuls, so every dot runs
# at HIGHEST precision (bf16x6 passes on the MXU — exact for f32).
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
        return _dot1(self.ohh, self.ohl)  # (Tc, 128)

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


def _sweep_once(consts: SamplerConsts, NRp, mp, kp, uni, tri, state,
                temp, n_steps_f, lam, mgm, SQT, invS2T, otherM, otherT,
                colnz):
    """One sweep on (1, B) lanes. `state` = (mass2, elem2, MT, YT, n_f,
    done_f, c0..c8); mirrors ops/sweep.py `sweep`."""
    (mass2, elem2f, MT, YT, n_f, done_f, *cs) = state
    B = consts.batch
    C = consts.capacity
    K = consts.k
    NB = consts.n_bins

    u1, u2, u_gibbs, u_exp, u_acc = (uni[j:j + 1] for j in range(5))
    ui0, ui1, ui2, ui3 = (uni[5 + j:6 + j] for j in range(4))

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
    ohr1m = (_iota0(NRp, B) == r1).astype(F32) * active.astype(F32)
    ohr2m = ((_iota0(NRp, B) == r2) & active & uses2).astype(F32)
    lmin1 = jnp.min(jnp.where(ohr1m > 0, lane_f, big), axis=1,
                    keepdims=True)
    lmin2 = jnp.min(jnp.where(ohr2m > 0, lane_f, big), axis=1,
                    keepdims=True)
    rmin = jnp.minimum(lmin1, lmin2)  # (NRp, 1)
    back1 = _dot0(rmin, ohr1m)  # (1, B); 0 where lane inactive
    back2 = _dot0(rmin, ohr2m)
    # active lanes always have ohr1m column sum 1, so back1 == rmin[r1]
    keep = active & (back1 >= lane_f)
    keep &= ~uses2 | (back2 >= lane_f)

    ta1m = _Tbl(a1c, C, active & uses_a1)
    ta2m = _Tbl(a2c, C, active & is_exch)
    acnt = ta1m.hit() + ta2m.hit()
    keep &= ~uses_a1 | (t_a1.gather(acnt) <= 1.0)
    keep &= ~is_exch | (t_a2.gather(acnt) <= 1.0)

    # capacity guard + budget truncation (inclusive prefix via tri)
    pre_birth_rank = _mm((keep & is_birth).astype(F32), tri)
    keep &= ~is_birth | (n_f + pre_birth_rank - 1.0 < C)
    rank = _mm(keep.astype(F32), tri)
    keep &= rank <= remaining

    is_birth &= keep
    is_death &= keep
    is_move &= keep
    is_exch &= keep

    # ---- alpha parameters from VMEM tables ----
    ohr1 = (_iota0(NRp, B) == r1).astype(F32)
    ohr2 = (_iota0(NRp, B) == r2).astype(F32)
    ohc1 = (_iota0(kp, B) == c1).astype(F32)
    ohc2 = (_iota0(kp, B) == c2).astype(F32)
    ones_k = jnp.ones((1, kp), F32)
    ones_m = jnp.ones((1, mp), F32)

    def pg(planes, ohr, ohc):  # planes (kp, NRp): value[i] = planes[c_i, r_i]
        return _mm(ones_k, _mm(planes, ohr) * ohc)

    s1 = pg(SQT, ohr1, ohc1)
    s2 = pg(SQT, ohr2, ohc2)
    smu1 = pg(YT, ohr1, ohc1)
    smu2 = pg(YT, ohr2, ohc2)

    W1 = _mm(invS2T, ohr1)  # (mp, B) invS2 row per lane
    o1 = _mm(otherM, ohc1)  # (mp, B) frozen partner column per lane
    o2 = _mm(otherM, ohc2)
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

    for rr, dd, vm, ohr, ohc, oS in (
            (r1, d1, v1m, ohr1, ohc1, o1),
            (r2, d2, v2m, ohr2, ohc2, o2)):
        old = pg(MT, ohr, ohc)
        actual = jnp.where(vm, jnp.maximum(old + dd, 0.0) - old, 0.0)
        # MT[c, r] += actual where (c_i, r_i) hit: (kp, NRp) outer sums
        MT = MT + _dot1(ohc * actual, ohr)
        # Y[r, c'] -= actual * Z[r, c, c'] with the Z row recomputed
        W_r = _mm(invS2T, ohr)  # (mp, B)
        zrow = _mm(otherT, oS * W_r)  # (kp, B)
        YT = YT - _dot1(zrow * actual, ohr)

    # ---- atom table writes + swap-with-back compaction ----
    write_a1 = death_kill | death_rebirth | move_acc | ex_acc
    mass_v1 = jnp.where(death_kill, 0.0,
                        jnp.where(death_rebirth, rebirth,
                                  jnp.where(ex_acc, nm1, m1)))
    elem_v1 = jnp.where(death_kill, -1.0, jnp.where(move_acc, elem2_,
                                                    elem1))

    birth_rank = _mm(birth_acc.astype(F32), tri)
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
    f_rank = _mm(t_filler.astype(F32), tri)
    hole = death_kill & (a1c < n_new)
    h_rank = _mm(hole.astype(F32), tri)
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
    return (mass2, elem2f, MT, YT, n_new, done_f + n_processed, *new_cs)


def _kernel(consts, NRp, mp, kp, s_max,
            uni_ref, mass_ref, elem_ref, MT_ref, YT_ref, SQT_ref,
            invS2T_ref, otherM_ref, otherT_ref, colnz_ref, scal_ref,
            omass_ref, oelem_ref, oMT_ref, oYT_ref, ocnt_ref):
    B = consts.batch

    n0 = scal_ref[0]
    n_steps_f = scal_ref[1]
    temp = scal_ref[2]
    lam = scal_ref[3]
    mgm = scal_ref[4]

    tri = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(F32)

    def body(s, carry):
        def do(c):
            uni = uni_ref[pl.ds(s * 16, 16), :]
            return _sweep_once(consts, NRp, mp, kp, uni, tri, c, temp,
                               n_steps_f, lam, mgm, SQT_ref[:],
                               invS2T_ref[:], otherM_ref[:], otherT_ref[:],
                               colnz_ref[:])

        done_f = carry[5]
        return jax.lax.cond(done_f < n_steps_f, do, lambda c: c, carry)

    zero = F32(0.0)
    init = (mass_ref[:], elem_ref[:], MT_ref[:], YT_ref[:],
            n0, zero, zero, zero, zero, zero, zero, zero, zero, zero,
            zero)
    out = jax.lax.fori_loop(0, s_max, body, init)
    (mass2, elem2f, MT, YT, n_f, done_f, *cs) = out
    omass_ref[:] = mass2
    oelem_ref[:] = elem2f
    oMT_ref[:] = MT
    oYT_ref[:] = YT
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
    K = consts.k
    NR = consts.n_rows
    m = consts.m
    NRp = _rup(NR, LANE)
    mp = _rup(m, 16)
    kp = _rup(K, 16)

    # pre-draw the identical threefry uniform streams the XLA path uses
    # (run_updates folds the key by global sweep index)
    off = jnp.int32(0) if sweep_offset is None else sweep_offset
    keys = jax.vmap(lambda i: jax.random.fold_in(key, off + i))(
        jnp.arange(s_max))

    def draw(k2):
        k_u, k_i = jax.random.split(k2, 2)
        us = jax.random.uniform(k_u, (B, 5), F32)
        ui = jax.random.uniform(k_i, (B, 4), F32)
        return jnp.concatenate([us, ui, jnp.zeros((B, 7), F32)], axis=1)

    uni = jax.vmap(draw)(keys)  # (s_max, B, 16)
    uni = jnp.swapaxes(uni, 1, 2).reshape(s_max * 16, B)

    mass2 = atoms.mass.reshape(C // LANE, LANE)
    elem2 = atoms.elem.astype(F32).reshape(C // LANE, LANE)

    def pad(X, rows, cols):
        out = jnp.zeros((rows, cols), F32)
        return jax.lax.dynamic_update_slice(out, X.astype(F32), (0, 0))

    MT = pad(M.T, kp, NRp)
    YT = pad(cache.Y.T, kp, NRp)
    SQT = pad(phase.SQ.T, kp, NRp)
    invS2T = pad(invS2.T, mp, NRp)
    otherM = pad(other_M, mp, kp)  # (mp, kp): columns by pattern
    otherT = pad(other_M.T, kp, mp)
    colnz = pad(phase.col_nz.astype(F32)[None, :], 1, kp)

    scal = jnp.stack([
        atoms.n.astype(F32),
        n_steps.astype(F32),
        jnp.asarray(temp, F32),
        mass.lam.astype(F32),
        mass.max_gibbs_mass.astype(F32),
    ])

    kern = functools.partial(_kernel, consts, NRp, mp, kp, s_max)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((kp, NRp), F32),
        jax.ShapeDtypeStruct((kp, NRp), F32),
        jax.ShapeDtypeStruct((16,), F32),
    )
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec] * 10 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(uni, mass2, elem2, MT, YT, SQT, invS2T, otherM, otherT, colnz, scal)
    omass, oelem, oMT, oYT, ocnt = res

    atoms_out = AtomTable(mass=omass.reshape(C),
                          elem=oelem.astype(jnp.int32).reshape(C),
                          n=ocnt[0].astype(jnp.int32))
    M_out = oMT[:K, :NR].T
    from ..models.dense import DenseCache
    cache_out = DenseCache(Y=oYT[:K, :NR].T)
    done = ocnt[1].astype(jnp.int32)
    n_sweeps = ocnt[2].astype(jnp.int32)
    counts = SweepCounts(processed=ocnt[3:7].astype(jnp.int32),
                         accepted=ocnt[7:11].astype(jnp.int32))
    return atoms_out, M_out, cache_out, done, n_sweeps, counts
