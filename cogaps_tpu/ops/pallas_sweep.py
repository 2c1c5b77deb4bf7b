"""Fused Pallas TPU kernel for the dense-model Gibbs update call.

ops/sweep.py expresses one conflict-free proposal sweep as ~25 XLA
gather/scatter ops. On the v5e those lower to serialized custom-call
gathers at ~100-170us EACH inside large programs (round-3 profiling),
putting a multi-ms floor under every sweep regardless of chain count.
This kernel runs an ENTIRE update call — all sweeps of one sampler's
GibbsSampler::update(nSteps) (reference: AsynchronousGibbsSampler.h:
89-121) — as one pallas_call with every table VMEM-resident.

Round-4 redesign — chains fused into every op (not python-unrolled):
the round-3 kernel unrolled chains as separate instruction DAGs, which
Mosaic does NOT interleave (measured flat, PERF_NOTES.md). Instead,
every per-lane tensor now carries a leading chain axis (NCH, B): the
VPU processes (8, 128) vregs natively, so widening a (1, B) row to
(NCH, B) costs nothing, and every table op becomes ONE batched
dot_general over per-chain planes instead of NCH serial ops.

Design rules (shaped by Mosaic's TPU lowering constraints — no scatter
primitive, no cumsum/sort, no jnp.where on BOOLEAN values — use |/& —
and iota must be integer-typed), all verified on-device
(tools/probe_mosaic5.py):

  * per-lane quantities are (NCH, B) float32; per-chain scalars are
    (NCH, 1) and broadcast;
  * EXACT f32 transport through the MXU uses a 3-way bf16 split of the
    value operand against a bf16 one-hot: f32 = hi + mid + lo with each
    part bf16-exact, so three single-pass bf16 matmuls reproduce the
    f32 gather/scatter bit-exactly at half the cost of a HIGHEST
    (bf16x6) f32 matmul;
  * conflict resolution is a match-matrix: cnt[i] = #earlier (or
    #other) active lanes touching lane i's rows/atoms, computed as
    (NCH, B, B) broadcast-compares reduced over the sublane axis —
    no capacity-sized tables, no scatter-min (which hangs this
    backend's compiler);
  * table rows for a batch of proposals are fetched by ONE stacked
    transport matmul per row-stream: [SQ | Y | M | invS2] (NR, 3k+m)
    against the (NR, B) one-hot, so s, s_mu, the old matrix value and
    the uncertainty row arrive together;
  * the pair term x and the Y-row updates are recomputed from the
    gathered invS2 row and frozen partner columns (models/dense.py:
    Z[r, c, c'] = sum_m o_mc o_mc' invS2[r, m]);
  * proposal semantics are IDENTICAL to ops/sweep.py (same pre-drawn
    threefry uniforms, same type/selection/accept formulas, same
    first-wins-rows + first-wins-atoms conflict rule, same
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
BF16 = jnp.bfloat16
# Mosaic lowers only DEFAULT (single-pass bf16) and HIGHEST (bf16x6).
# DEFAULT is exact for 0/1 masks and integer sums <= 256; HIGHEST for
# larger integer ranks. Exact f32 VALUE transport uses _split3 + bf16
# matmuls instead of HIGHEST (3 passes instead of 6).
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
    # Giles (2010) single-precision rational approximation
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


def _split3(x):
    """Exact 3-way bf16 decomposition: x == hi + mid + lo with every
    part bf16 (8 mantissa bits each covers f32's 24; the residuals are
    exactly representable — Sterbenz)."""
    hi = x.astype(BF16)
    r1 = x - hi.astype(F32)
    mid = r1.astype(BF16)
    lo = (r1 - mid.astype(F32)).astype(BF16)
    return hi, mid, lo


def _bdot(a, b, ca, cb, prec=None):
    """Batched dot over the leading chain axis; contract dims (ca, cb)."""
    kw = {} if prec is None else {"precision": prec}
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=F32, **kw)


def _tdot(val_f32, oh_bf16, ca, cb):
    """Exact f32 transport matmul: split3(val) against a 0/1 bf16
    one-hot — three single-pass bf16 matmuls, bit-exact."""
    out = None
    for part in _split3(val_f32):
        d = _bdot(part, oh_bf16, ca, cb)
        out = d if out is None else out + d
    return out


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=_PREC)


def _mm_fast(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _lanesum(x):
    """Row-sum (NCH, B) -> (NCH, 1) via an exact HIGHEST matvec —
    Mosaic rejects keepdims lane reductions when NCH == 1."""
    return _mm(x, jnp.ones((x.shape[1], 1), F32))


class _BT:
    """Batched one-hot access to per-chain flat tables stored as
    (NCH, T/128, 128). `idx` is (NCH, B) f32; `valid` masks lanes."""

    def __init__(self, idx, T: int, valid=None):
        NCH, B = idx.shape
        hi = jnp.floor(idx / LANE)
        lo = idx - hi * LANE
        ih = jax.lax.broadcasted_iota(jnp.int32, (1, T // LANE, B), 1
                                      ).astype(F32)
        il = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, B), 1
                                      ).astype(F32)
        ohh = (ih == hi[:, None, :]).astype(F32)
        ohl = (il == lo[:, None, :]).astype(F32)
        if valid is not None:
            # the 2D->3D broadcast must stay in f32 (Mosaic rejects
            # bf16 sublane-unit reshapes); cast after masking
            v = valid.astype(F32)[:, None, :]
            ohh = ohh * v
            ohl = ohl * v
        self.ohh = ohh.astype(BF16)
        self.ohl = ohl.astype(BF16)

    def gather(self, t2):
        """(NCH, B) values; 0 for masked lanes. Exact."""
        W = _tdot(t2, self.ohh, 1, 1)  # (NCH, LANE, B)
        return jnp.sum(W * self.ohl, axis=1)

    def gather2(self, t2a, t2b):
        """Gather from two stacked tables with one transport matmul."""
        t2s = jnp.concatenate([t2a, t2b], axis=2)  # (NCH, T/128, 256)
        W = _tdot(t2s, self.ohh, 1, 1)  # (NCH, 256, B)
        va = jnp.sum(W[:, :LANE] * self.ohl, axis=1)
        vb = jnp.sum(W[:, LANE:] * self.ohl, axis=1)
        return va, vb

    def hit(self):
        # occupancy counts: single-pass bf16 products of 0/1 masks;
        # per-slot counts from conflict-free writes are <= 1 (exact)
        return _bdot(self.ohh, self.ohl, 2, 2)  # (NCH, Tc, LANE)

    def sums(self, vals):
        out = None
        for part in _split3(vals):
            # broadcast in f32 (bf16 sublane-unit reshapes are
            # rejected), cast back for the single-pass matmul — exact
            p3 = part.astype(F32)[:, None, :].astype(BF16)
            d = _bdot(self.ohh * p3, self.ohl, 2, 2)
            out = d if out is None else out + d
        return out

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


# ----------------------------------------------------------------------
# Slab-major row tables. Every (NR, k) factor-side table is stored as
# (NCH, 128, RH*k) with element [rl, rh*k + c] = tbl[rh*128 + rl, c]
# (rows padded to NRp = RH*128). A row gather/scatter then contracts
# over 128 sublane slots instead of NR lanes, and the rh*k+c selection
# is a cheap small-axis masked reduce — no (NCH, NR, B) one-hots exist
# anywhere. invS2 uses the j-major variant [rl, j*RH + rh] so each of
# the m uncertainty-row components is a contiguous RH-slice.
# ----------------------------------------------------------------------
def slab_shape(NR: int, k: int):
    RH = _rup(NR, LANE) // LANE
    return RH, RH * k


def to_slab(X, NR=None):
    """(NCH, NR, k) -> (NCH, 128, RH*k), zero row padding. XLA-side."""
    NCH, NR_, k = X.shape
    RH, Q = slab_shape(NR_, k)
    Xp = jnp.pad(X, ((0, 0), (0, RH * LANE - NR_), (0, 0)))
    return Xp.reshape(NCH, RH, LANE, k).transpose(0, 2, 1, 3).reshape(
        NCH, LANE, Q)


def from_slab(X2, NR: int, k: int):
    """Inverse of to_slab. XLA-side."""
    NCH = X2.shape[0]
    RH, _ = slab_shape(NR, k)
    X = X2.reshape(NCH, LANE, RH, k).transpose(0, 2, 1, 3).reshape(
        NCH, RH * LANE, k)
    return X[:, :NR]


def to_slab_jmajor(X, NR=None):
    """(NCH, NR, m) -> (NCH, 128, m*RH), j-major. XLA-side."""
    NCH, NR_, m = X.shape
    RH, _ = slab_shape(NR_, m)
    Xp = jnp.pad(X, ((0, 0), (0, RH * LANE - NR_), (0, 0)))
    return Xp.reshape(NCH, RH, LANE, m).transpose(0, 2, 3, 1).reshape(
        NCH, LANE, m * RH)


def use_ztable(consts: SamplerConsts) -> bool:
    """Static per-sampler choice of the pair-term/Y-update source:
    small m keeps the invS2 row (m*RH wide) and recomputes Z terms
    on the fly; large m (the P sampler — m is the gene axis) uses the
    precomputed Z table in c'-major slab form (k*RHz wide). The
    sparse-model path forces ztable mode with its own G table
    (models/sparse.kernel_tables)."""
    return consts.m > consts.k * consts.k


class _Phase:
    """Per-update-call constants living in VMEM for the sweep loop:
    pre-split static slab tables (SQ and either invS2 or Z) and the
    frozen partner factor."""

    def __init__(self, SQ2, WZ2, other):
        self.SQ_parts = _split3(SQ2)  # 3 x (NCH, 128, Q) bf16
        self.WZ_parts = _split3(WZ2)  # 3 x (NCH, 128, m*RH | k*RHz)
        self.other = other  # (NCH, m, k) f32
        # canUseGibbs per column (DenseNormalModel.cpp:100-103)
        self.colnz = (jnp.max(other, axis=1) > 0.0
                      ).astype(F32)[:, :, None]  # (NCH, k, 1)


def _sweep_b(consts: SamplerConsts, uni, tri, state,
             temp, n_steps_f, lam, mgm, phase: _Phase, zt: bool,
             zt_rowmajor: bool = False, ablate: frozenset = frozenset()):
    """One batched sweep over (NCH, B) lanes for NCH independent
    chains. `state` = (mass2, elem2, M, Y, n_f, done_f, c0..c8) with
    per-chain scalars shaped (NCH, 1). Mirrors ops/sweep.sweep exactly
    per chain (the differential oracle)."""
    (mass2, elem2f, M, Y, n_f, done_f, *cs) = state
    NCH = n_f.shape[0]
    NR = consts.n_rows
    B = consts.batch
    C = consts.capacity
    K = consts.k
    NB = consts.n_bins

    u1, u2, u_gibbs, u_exp, u_acc = (uni[j] for j in range(5))
    ui0, ui1, ui2, ui3 = (uni[5 + j] for j in range(4))
    mm_rank = _mm_fast if B <= 256 else _mm  # bf16 exactness bound

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(F32)
    remaining = n_steps_f - done_f  # (NCH, 1)
    active = lane < jnp.minimum(remaining, float(B))  # (NCH, B)

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

    # both atom picks through ONE lane-concatenated transport
    if "picks" in ablate:  # ablation probe: constant picks
        elem_a1 = elem_a2 = a1c % float(NB)
        m1g = m2 = jnp.abs(u2) + 0.5
    else:
        t_a12 = _BT(jnp.concatenate([a1c, a2c], axis=1), C)
        elem_a12, m12 = t_a12.gather2(elem2f, mass2)
        elem_a1, elem_a2 = elem_a12[:, :B], elem_a12[:, B:]
        m1g, m2 = m12[:, :B], m12[:, B:]
    m1 = jnp.where(is_birth, 0.0, m1g)
    elem1 = jnp.where(is_birth, e_birth, jnp.maximum(elem_a1, 0.0))
    if consts.local_moves:
        # symmetric local move window (identical formula to
        # ops/sweep.sweep — the differential oracle)
        W_f = jnp.maximum(1.0, jnp.floor(NB / n_c))
        t2m = ui3 * 2.0
        sgn = jnp.where(t2m < 1.0, -1.0, 1.0)
        frac = t2m - jnp.floor(t2m)
        mag = jnp.minimum(jnp.floor(frac * W_f) + 1.0, W_f)
        e_move = (elem1 + sgn * mag) % NB
    else:
        e_move = jnp.minimum(jnp.floor(ui3 * NB), float(NB - 1))
    elem2_ = jnp.where(is_move, e_move, jnp.maximum(elem_a2, 0.0))
    # float division by k is exactly floor-safe for e < 2^24
    r1 = jnp.floor(elem1 / K)
    c1 = elem1 - r1 * K
    r2 = jnp.floor(elem2_ / K)
    c2 = elem2_ - r2 * K
    uses2 = is_move | is_exch
    uses_a1 = is_death | is_move | is_exch

    # ---- conflict resolution: match-matrix earlier-lane tests.
    # Identical keep set to ops/sweep._keep: exact first-wins on rows
    # and atoms.
    # Claiming lanes are encoded by SENTINEL values (inactive streams
    # hold negative sentinels that match no real index), so the 3-D
    # work is pure bool compare/AND/OR + one max-reduce per test — no
    # (B, B) float arithmetic at all.
    def blocked(v1m, v2m, q, mask3):
        """Does any masked lane j claim (via either stream) lane i's
        value q? v*m are sentinel-masked j-side values, (NCH, B)."""
        c = ((v1m[:, :, None] == q[:, None, :])
             | (v2m[:, :, None] == q[:, None, :])) & mask3
        # bf16 reduce halves the transient; f32 result (not bool):
        # lane-slicing i1 vectors trips Mosaic's vreg bitcasts, so
        # callers compare after slicing
        return jnp.max(c.astype(BF16), axis=1).astype(F32)

    # both streams' queries lane-stacked: ONE (NCH, B, 2B) test per
    # entity class instead of two (NCH, B, B) tests — half the issue
    # count for the same element volume. earlier2[j, i] = j < (i mod
    # B): lane i and lane B+i are the same proposal's two streams
    # (B is a power of two, so mod is a mask)
    iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (1, B, 2 * B), 1)
    iota_i2 = jax.lax.broadcasted_iota(jnp.int32, (1, B, 2 * B), 2)
    earlier2 = iota_j2 < (iota_i2 & (B - 1))

    if "conflict" in ablate:  # ablation probe: keep everything
        keep = active
    else:
        r1m = jnp.where(active, r1, -1.0)
        r2m = jnp.where(active & uses2, r2, -3.0)
        rb = blocked(r1m, r2m, jnp.concatenate([r1, r2], axis=1),
                     earlier2)
        keep = active & ~(rb[:, :B] > 0.0)
        keep &= ~uses2 | ~(rb[:, B:] > 0.0)

        a1m = jnp.where(active & uses_a1, a1c, -1.0)
        a2m = jnp.where(active & is_exch, a2c, -3.0)
        ab_ = blocked(a1m, a2m, jnp.concatenate([a1c, a2c], axis=1),
                      earlier2)
        keep &= ~uses_a1 | ~(ab_[:, :B] > 0.0)
        keep &= ~is_exch | ~(ab_[:, B:] > 0.0)

    # capacity guard + budget truncation (inclusive prefix via tri)
    pre_birth_rank = mm_rank((keep & is_birth).astype(F32), tri)
    keep &= ~is_birth | (n_f + pre_birth_rank - 1.0 < C)
    rank = mm_rank(keep.astype(F32), tri)
    keep &= rank <= remaining

    is_birth &= keep
    is_death &= keep
    is_move &= keep
    is_exch &= keep

    # ---- alpha parameters: one stacked slab transport for BOTH
    # row-streams (lanes concatenated), then cheap q-selections ----
    RH, Q = slab_shape(NR, K)
    m_ = consts.m
    rh1 = jnp.floor(r1 / LANE)
    rl1 = r1 - rh1 * LANE
    rh2 = jnp.floor(r2 / LANE)
    rl2 = r2 - rh2 * LANE
    il = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, B), 1
                                  ).astype(F32)
    ohrl1_b = (il == rl1[:, None, :]).astype(BF16)
    ohrl2_b = (il == rl2[:, None, :]).astype(BF16)

    Y_parts = _split3(Y)
    M_parts = _split3(M)
    # one gather matmul-set per row-stream (NOT lane-concatenated: the
    # (NCH, 3Q+mRH, 2B) form doubles the peak-VMEM transient)
    A1 = A2 = None
    if "gather" not in ablate:
        for sq_p, wz_p, y_p, m_p in zip(phase.SQ_parts, phase.WZ_parts,
                                        Y_parts, M_parts):
            if zt:
                stack = jnp.concatenate([sq_p, y_p, m_p], axis=2)
            else:
                stack = jnp.concatenate([sq_p, y_p, m_p, wz_p], axis=2)
            d1g = _bdot(stack, ohrl1_b, 1, 1)  # (NCH, 3Q[+m*RH], B)
            d2g = _bdot(stack, ohrl2_b, 1, 1)
            A1 = d1g if A1 is None else A1 + d1g
            A2 = d2g if A2 is None else A2 + d2g

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, Q, B), 1
                                      ).astype(F32)
    q1 = rh1 * K + c1
    q2 = rh2 * K + c2
    # bf16 selection masks: 0/1 exact, halves the (NCH, Q, B) footprint
    ohq1 = (iota_q == q1[:, None, :]).astype(F32).astype(BF16)
    ohq2 = (iota_q == q2[:, None, :]).astype(F32).astype(BF16)
    iota_rh = jax.lax.broadcasted_iota(jnp.int32, (1, RH, B), 1
                                       ).astype(F32)
    ohrh1 = (iota_rh == rh1[:, None, :]).astype(F32)
    ohrh2 = (iota_rh == rh2[:, None, :]).astype(F32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, K, B), 1
                                      ).astype(F32)
    ohc1 = (iota_k == c1[:, None, :]).astype(F32)
    ohc2 = (iota_k == c2[:, None, :]).astype(F32)

    def sel(As, lo, ohq_):
        return jnp.sum(As[:, lo:lo + Q] * ohq_, axis=1)

    if "gather" in ablate:  # ablation probe: constant alpha terms
        s1 = 1.0 + u_gibbs
        smu1 = u_exp
        old1 = u_acc
        s2 = 1.0 + u_acc
        smu2 = u_exp * 0.5
        old2 = u_gibbs
        x = u_exp * 0.25
        zrow1 = jnp.broadcast_to(u_gibbs[:, None, :] * 0.1,
                                 (u_gibbs.shape[0], K, B))
        zrow2 = zrow1 * 0.5
        same_row = (r1 == r2).astype(F32)
        s_pair = s1 + s2 - 2.0 * x * same_row
        smu_pair = smu1 - smu2
        _gather_ablated = True
    else:
        _gather_ablated = False

    def wrow(As, ohrh_):
        # invS2 row components: j-major contiguous RH slices. With a
        # single row-slab (RH == 1) the slab IS the row directly.
        if RH == 1:
            return As[:, 3 * Q:]
        return jnp.concatenate(
            [jnp.sum(As[:, 3 * Q + j * RH:3 * Q + (j + 1) * RH] * ohrh_,
                     axis=1)[:, None, :] for j in range(m_)], axis=1)

    if not _gather_ablated:
        s1 = sel(A1, 0, ohq1)
        smu1 = sel(A1, Q, ohq1)
        old1 = sel(A1, 2 * Q, ohq1)
        s2 = sel(A2, 0, ohq2)
        smu2 = sel(A2, Q, ohq2)
        old2 = sel(A2, 2 * Q, ohq2)

    if _gather_ablated:
        pass
    elif zt and zt_rowmajor:
        # NR <= 128 sampler with the Z table stored ROW-MAJOR as
        # (128 row-sublanes, k*k lanes): Z2[r, j*K + c'] = Z[r, j, c']
        # (symmetric in (j, c')). Gather the full k x k row block by a
        # row one-hot, then zrow[j] = sum_c' Z2row[j*K + c'] ohc[c'] —
        # the in-kernel rebuild (ops/pallas_iter.py) produces exactly
        # this layout without any relayout.
        il2 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, B), 1
                                       ).astype(F32)
        ohs1 = (il2 == r1[:, None, :]).astype(BF16)
        ohs2 = (il2 == r2[:, None, :]).astype(BF16)
        Az1 = Az2 = None
        for z_p in phase.WZ_parts:
            d1z = _bdot(z_p, ohs1, 1, 1)  # (NCH, K*K, B)
            d2z = _bdot(z_p, ohs2, 1, 1)
            Az1 = d1z if Az1 is None else Az1 + d1z
            Az2 = d2z if Az2 is None else Az2 + d2z

        def zselr(Azs, ohc_):
            return jnp.concatenate(
                [jnp.sum(Azs[:, j * K:(j + 1) * K] * ohc_,
                         axis=1)[:, None, :] for j in range(K)],
                axis=1)

        zrow1 = zselr(Az1, ohc1)
        zrow2 = zselr(Az2, ohc2)
        x = jnp.sum(zrow1 * ohc2, axis=1)
    elif zt:
        # large-m sampler (m > k^2, e.g. the P side whose reduction
        # axis is the gene dimension): the pair/Y-update row comes
        # from the precomputed Z table (NB, k) in c'-major slab form —
        # k*RHz wide instead of m*RH
        NBp = _rup(NB, LANE)
        RHz = NBp // LANE
        rhz1 = jnp.floor(elem1 / LANE)
        rlz1 = elem1 - rhz1 * LANE
        rhz2 = jnp.floor(elem2_ / LANE)
        rlz2 = elem2_ - rhz2 * LANE
        ilb = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, B), 1
                                       ).astype(F32)
        ohrlz1 = (ilb == rlz1[:, None, :]).astype(BF16)
        ohrlz2 = (ilb == rlz2[:, None, :]).astype(BF16)
        Az1 = Az2 = None
        for z_p in phase.WZ_parts:
            d1z = _bdot(z_p, ohrlz1, 1, 1)  # (NCH, K*RHz, B)
            d2z = _bdot(z_p, ohrlz2, 1, 1)
            Az1 = d1z if Az1 is None else Az1 + d1z
            Az2 = d2z if Az2 is None else Az2 + d2z
        if RHz == 1:
            zrow1, zrow2 = Az1, Az2
        else:
            iota_rhz = jax.lax.broadcasted_iota(
                jnp.int32, (1, RHz, B), 1).astype(F32)
            ohz1 = (iota_rhz == rhz1[:, None, :]).astype(F32)
            ohz2 = (iota_rhz == rhz2[:, None, :]).astype(F32)

            def zsel(Azs, ohz_):
                return jnp.concatenate(
                    [jnp.sum(Azs[:, c * RHz:(c + 1) * RHz] * ohz_,
                             axis=1)[:, None, :] for c in range(K)],
                    axis=1)

            zrow1 = zsel(Az1, ohz1)
            zrow2 = zsel(Az2, ohz2)
        x = jnp.sum(zrow1 * ohc2, axis=1)
    else:
        W1 = wrow(A1, ohrh1)  # (NCH, m, B)
        W2 = wrow(A2, ohrh2)
        o1 = _bdot(phase.other, ohc1, 2, 1, _PREC)  # (NCH, m, B)
        o2 = _bdot(phase.other, ohc2, 2, 1, _PREC)
        x = jnp.sum(o1 * o2 * W1, axis=1)
        zrow1 = _bdot(phase.other, o1 * W1, 1, 1, _PREC)  # (NCH, k, B)
        zrow2 = _bdot(phase.other, o2 * W2, 1, 1, _PREC)
    if not _gather_ablated:
        same_row = (r1 == r2).astype(F32)
        s_pair = s1 + s2 - 2.0 * x * same_row
        smu_pair = smu1 - smu2

    can1 = jnp.sum(phase.colnz * ohc1, axis=1) > 0.5
    can2 = jnp.sum(phase.colnz * ohc2, axis=1) > 0.5
    log_u = jnp.log(jnp.maximum(u_acc, F32(1e-37)))
    # dense-model noise floors are 0 (models/dense.py AlphaBatch)
    rel1 = jnp.abs(smu1) > 0.0
    rel_pair = jnp.abs(smu_pair) > 0.0

    if "acc" in ablate:  # ablation probe: cheap stand-in draws
        def _gm_ab(u, s, smu, a, b, lam2=None):
            return jnp.clip(u * (b - a) + a + smu * 0.0, a, b), s > 0.0
        gm_fn = _gm_ab
    else:
        gm_fn = _gibbs_mass

    # ---- all three Gibbs-mass draws (birth / death-rebirth /
    # exchange) as ONE stacked truncated-normal evaluation on
    # (NCH, 3B) lanes. Elementwise formulas are lane-local, so every
    # lane's value is bitwise identical to three separate calls at a
    # third of the instruction count; lam = 0 for the exchange segment
    # reproduces the lambda-free gibbsMass form (reference:
    # AlphaParameters.cpp:27-48) ----
    d_s = s1 * temp
    d_smu = (smu1 + m1 * s1) * temp
    p_s = s_pair * temp
    p_smu = smu_pair * temp
    mgm_b = jnp.broadcast_to(mgm, m1.shape)
    lam_b = jnp.broadcast_to(lam, m1.shape)
    zero_b = jnp.zeros_like(m1)
    gm_stk, gok_stk = gm_fn(
        jnp.concatenate([u_gibbs] * 3, axis=1),
        jnp.concatenate([s1 * temp, d_s, p_s], axis=1),
        jnp.concatenate([smu1 * temp, d_smu, p_smu], axis=1),
        jnp.concatenate([zero_b, zero_b, -m1], axis=1),
        jnp.concatenate([mgm_b, mgm_b, m2], axis=1),
        jnp.concatenate([lam_b, lam_b, zero_b], axis=1))
    gokf = gok_stk.astype(F32)  # f32 before lane-slicing (i1 lane
    # slices trip Mosaic's vreg bitcasts)
    g_mass, g_ok = gm_stk[:, :B], gokf[:, :B] > 0.5
    d_gm, d_gok = gm_stk[:, B:2 * B], gokf[:, B:2 * B] > 0.5
    x_mass, x_ok = gm_stk[:, 2 * B:], gokf[:, 2 * B:] > 0.5

    # birth lane
    e_mass = -jnp.log(jnp.maximum(u_exp, F32(1e-30))) / lam
    b_mass = jnp.where(can1, g_mass, e_mass)
    b_has = ~can1 | (g_ok & rel1)
    birth_acc = is_birth & b_has & (b_mass > F32(EPS))

    # death lane
    rel_d = jnp.abs(smu1 + m1 * s1) > 0.0
    rebirth = jnp.where(can1 & d_gok & rel_d, d_gm, m1)
    dll_death = rebirth * (d_smu - d_s * rebirth * 0.5)
    death_rebirth = is_death & (log_u < dll_death)
    death_kill = is_death & ~(log_u < dll_death)

    # move lane
    same_elem = elem1 == elem2_
    dll_move = -m1 * (p_smu + p_s * m1 * 0.5)
    move_acc = is_move & ~same_elem & (log_u < dll_move)

    # exchange lane; same-bin exchanges redistribute the pooled mass by
    # a truncated shape-2 gamma, auto-accepted, matrix untouched
    # (reference: ProposalQueue.cpp:267-277, Random.cpp:194-200) —
    # identical formula to ops/rng.trunc_gamma2_y
    b_sb = jnp.maximum((m1 + m2) * lam, F32(1e-6))
    if "acc" in ablate:
        new_sb = (m1 + m2) * u_gibbs
    else:
        upper_sb = 1.0 - jnp.exp(-b_sb) * (1.0 + b_sb)
        q_sb = jnp.maximum(u_gibbs * upper_sb, F32(1e-12))
        y_sb = jnp.clip(jnp.sqrt(2.0 * q_sb), 1e-6, b_sb)
        for _ in range(12):
            ey = jnp.exp(-y_sb)
            h_sb = 1.0 - ey * (1.0 + y_sb)
            dh = jnp.maximum(ey * y_sb, F32(1e-30))
            y_sb = jnp.clip(y_sb - (h_sb - q_sb) / dh, 1e-7, b_sb)
        new_sb = y_sb / lam
    d_sb = jnp.where(m1 > m2, new_sb - m1, m2 - new_sb)
    same_f = same_elem.astype(F32)
    nm1 = m1 + same_f * d_sb + (1.0 - same_f) * x_mass
    nm2 = m2 - same_f * d_sb - (1.0 - same_f) * x_mass
    ex_ok = ((same_elem & is_exch)
             | (~same_elem & (can1 | can2) & x_ok & rel_pair))
    ex_acc = is_exch & ex_ok & (nm1 > F32(EPS)) & (nm2 > F32(EPS))

    # ---- matrix deltas -> M planes + Y updates ----
    d1 = jnp.where(birth_acc, b_mass, 0.0)
    d1 = jnp.where(death_kill, -m1, d1)
    d1 = jnp.where(death_rebirth, rebirth - m1, d1)
    d1 = jnp.where(move_acc, -m1, d1)
    d1 = jnp.where(ex_acc & ~same_elem, nm1 - m1, d1)
    v1m = birth_acc | death_kill | death_rebirth | move_acc | ex_acc
    d2 = jnp.where(move_acc, m1, 0.0)
    d2 = jnp.where(ex_acc & ~same_elem, nm2 - m2, d2)
    v2m = move_acc | ex_acc

    # all used rows are distinct across lanes AND streams (conflict
    # rule), so both streams can read pre-sweep rows and their scatters
    # commute; a same-lane same-row pair touches two different columns
    # (same-element proposals never apply). Per stream the write vector
    # over the rh-block is dM = actual at column c and dY = -actual *
    # zrow at all k columns; both streams' scatters run as ONE
    # lane-concatenated transport contraction.
    ohrhK1 = (jnp.floor(iota_q / K) == rh1[:, None, :]).astype(F32
                                                               ).astype(BF16)
    ohrhK2 = (jnp.floor(iota_q / K) == rh2[:, None, :]).astype(F32
                                                               ).astype(BF16)
    if "scatter" not in ablate:
        dT = None
        for dd, vm, old, ohc, ohrhK, zrow, ohrl_b in (
                (d1, v1m, old1, ohc1, ohrhK1, zrow1, ohrl1_b),
                (d2, v2m, old2, ohc2, ohrhK2, zrow2, ohrl2_b)):
            actual = jnp.where(vm, jnp.maximum(old + dd, 0.0) - old, 0.0)
            val_m = ohc * actual[:, None, :]  # (NCH, K, B)
            val_y = -zrow * actual[:, None, :]
            tiled = jnp.concatenate(
                [jnp.concatenate([val_m] * RH, axis=1),
                 jnp.concatenate([val_y] * RH, axis=1)],
                axis=1)  # (NCH, 2Q, B)
            valq = tiled * jnp.concatenate([ohrhK, ohrhK], axis=1)
            for part in _split3(valq):
                d = jax.lax.dot_general(
                    ohrl_b, part, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=F32)  # (NCH, 128, 2Q)
                dT = d if dT is None else dT + d
        M = M + dT[:, :, :Q]
        Y = Y + dT[:, :, Q:]
    else:  # ablation probe: cheap fake update keeps M/Y live
        M = M + _lanesum(d1)[:, :, None] * 1e-9
        Y = Y + _lanesum(d2)[:, :, None] * 1e-9

    # ---- atom table writes + swap-with-back compaction ----
    if "atoms" in ablate:  # ablation probe: skip table maintenance
        mass2 = mass2 + _lanesum(d1)[:, :, None] * 1e-9
        elem2f = elem2f + _lanesum(d2)[:, :, None] * 0.0
        n_new = n_f
        n_processed = _lanesum(keep.astype(F32))
        sums = [_lanesum(m_.astype(F32)) for m_ in
                (is_birth, is_death, is_move, is_exch, birth_acc,
                 death_kill | death_rebirth, move_acc, ex_acc)]
        new_cs = [cs[0] + 1.0] + [c + s for c, s in zip(cs[1:], sums)]
        return (mass2, elem2f, M, Y, n_new, done_f + n_processed,
                *new_cs)
    write_a1 = death_kill | death_rebirth | move_acc | ex_acc
    mass_v1 = jnp.where(death_kill, 0.0,
                        jnp.where(death_rebirth, rebirth,
                                  jnp.where(ex_acc, nm1, m1)))
    elem_v1 = jnp.where(death_kill, -1.0, jnp.where(move_acc, elem2_,
                                                    elem1))

    birth_rank = mm_rank(birth_acc.astype(F32), tri)
    bslot = n_f + birth_rank - 1.0  # < C by the capacity guard

    # all three write streams (in-place a1, exchange-partner a2, birth
    # slots) target provably disjoint slots, so they combine into ONE
    # 3B-lane masked scatter per table (order-independent)
    idx3 = jnp.concatenate(
        [a1c, a2c, jnp.where(birth_acc, bslot, 0.0)], axis=1)
    wf = write_a1.astype(F32)
    xf = ex_acc.astype(F32)
    bf = birth_acc.astype(F32)
    tw_mass = _BT(idx3, C, jnp.concatenate([wf, xf, bf], axis=1))
    tw_elem = _BT(idx3, C, jnp.concatenate(
        [wf, jnp.zeros_like(wf), bf], axis=1))
    mass2 = tw_mass.set(
        mass2, jnp.concatenate([mass_v1, nm2, b_mass], axis=1))
    elem2f = tw_elem.set(
        elem2f, jnp.concatenate([elem_v1, elem_v1, e_birth], axis=1))

    n_b = _lanesum(birth_acc.astype(F32))
    n_d = _lanesum(death_kill.astype(F32))
    top = n_f + n_b
    n_new = top - n_d

    hole_tab = _BT(a1c, C, death_kill).hit()
    t_slot = jnp.minimum(n_new + lane, float(C - 1))
    t_valid = lane < n_d
    t_is_hole = _BT(t_slot, C).gather(hole_tab) > 0.5
    t_filler = t_valid & ~t_is_hole
    f_rank = mm_rank(t_filler.astype(F32), tri)
    hole = death_kill & (a1c < n_new)
    h_rank = mm_rank(hole.astype(F32), tri)
    Bp = _rup(B + 2, LANE)
    NCH_ = n_f.shape[0]
    rank_to_src = _BT(jnp.minimum(f_rank, Bp - 1.0), Bp, t_filler).set(
        jnp.zeros((NCH_, Bp // LANE, LANE), F32), t_slot)
    src = _BT(jnp.minimum(h_rank, Bp - 1.0), Bp).gather(rank_to_src)
    tsrc = _BT(jnp.minimum(src, float(C - 1)), C)
    fill_elem, fill_mass = tsrc.gather2(elem2f, mass2)
    # hole refills (< n_new) and tail clears (>= n_new) are disjoint:
    # one combined 2B-lane scatter per table
    thc = _BT(jnp.concatenate([a1c, t_slot], axis=1), C,
              jnp.concatenate([hole.astype(F32),
                               jnp.broadcast_to(t_valid.astype(F32),
                                                hole.shape)], axis=1))
    elem2f = thc.set(elem2f, jnp.concatenate(
        [fill_elem, jnp.full(t_slot.shape, -1.0, F32)], axis=1))
    mass2 = thc.set(mass2, jnp.concatenate(
        [fill_mass, jnp.zeros(t_slot.shape, F32)], axis=1))

    n_processed = _lanesum(keep.astype(F32))
    sums = [_lanesum(m.astype(F32)) for m in
            (is_birth, is_death, is_move, is_exch, birth_acc,
             death_kill | death_rebirth, move_acc, ex_acc)]
    new_cs = [cs[0] + 1.0] + [c + s for c, s in zip(cs[1:], sums)]
    return (mass2, elem2f, M, Y, n_new, done_f + n_processed, *new_cs)


def _tri(B):
    return (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
            ).astype(F32)


def _kernel_b(consts, s_max, NCH, use_prng, zt, ablate,
              uni_ref, mass_ref, elem_ref, M_ref, Y_ref, SQ_ref,
              invS2_ref, other_ref, scal_ref,
              omass_ref, oelem_ref, oM_ref, oY_ref, ocnt_ref):
    """NCH chains' update calls fused into every op of one sweep loop.

    use_prng: draw the per-sweep uniform block from the on-core PRNG
    (seeded from scal column 5) instead of the pre-drawn threefry slab
    — the engine's TPU fast path (no host-side uniform generation or
    transfer). Host-uniform mode remains the exact differential-oracle
    path (tests, interpret mode)."""
    B = consts.batch

    tri = _tri(B)
    phase = _Phase(SQ_ref[:], invS2_ref[:], other_ref[:])

    n0 = scal_ref[:, 0:1]
    n_steps_f = scal_ref[:, 1:2]
    temp = scal_ref[:, 2:3]
    lam = scal_ref[:, 3:4]
    mgm = scal_ref[:, 4:5]

    if use_prng:
        # one core-level stream per kernel call; chains are separated
        # by their position in the (16, NCH, B) draw
        seed = jnp.sum(scal_ref[:, 5].astype(jnp.int32))
        pltpu.prng_seed(seed)

    # while_loop: only REAL sweeps execute — unused s_max slack costs
    # nothing (a skipped fori+cond iteration was measured at up to
    # ~1.7ms on this backend: the identity branch copies the carry)
    def cond(carry):
        s, st = carry
        done_f = st[5]
        left = jnp.sum(jnp.maximum(n_steps_f - done_f, 0.0))
        return (s < s_max) & (left > 0.0)

    def body(carry):
        s, st = carry
        if use_prng:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((16, NCH, B)), jnp.uint32)
            uni = pltpu.bitcast(
                (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000),
                jnp.float32) - 1.0
        else:
            uni = uni_ref[pl.ds(s * 16, 16)]  # (16, NCH, B)
        st = _sweep_b(consts, uni, tri, st, temp,
                      n_steps_f, lam, mgm, phase, zt, ablate=ablate)
        return (s + 1, st)

    z = jnp.zeros((NCH, 1), F32)
    init = (mass_ref[:], elem_ref[:], M_ref[:], Y_ref[:],
            n0, z, z, z, z, z, z, z, z, z, z)
    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    (mass2, elem2f, M, Y, n_f, done_f, *cs) = out
    omass_ref[:] = mass2
    oelem_ref[:] = elem2f
    oM_ref[:] = M
    oY_ref[:] = Y
    cnt = jnp.concatenate([n_f, done_f] + list(cs)
                          + [jnp.zeros((NCH, 5), F32)], axis=1)
    ocnt_ref[:] = cnt


def _call_kernel(uni, atoms: AtomTable, M, Y, SQ, invS2, other_M, scal,
                 consts: SamplerConsts, s_max: int, interpret: bool,
                 use_prng: bool = False, z_flat=None):
    """Invoke the batched kernel; all per-chain arrays carry a leading
    NCH axis. `uni` is (s_max*16, NCH, B) in host-uniform mode and a
    tiny dummy in PRNG mode. Row tables are converted to slab-major
    form for the kernel and back on the way out."""
    NCH = M.shape[0]
    C = consts.capacity
    NR = consts.n_rows
    K = consts.k
    RH, Q = slab_shape(NR, K)

    mass2 = atoms.mass.reshape(NCH, C // LANE, LANE)
    elem2 = atoms.elem.astype(F32).reshape(NCH, C // LANE, LANE)

    zt = use_ztable(consts) or z_flat is not None
    # ablation probe hook (tools/probe_sweep_cost.py): comma-separated
    # section names in COGAPS_ABLATE stub out kernel sections for
    # timing attribution; empty (the default) is the real kernel
    import os
    ablate = frozenset(
        filter(None, os.environ.get("COGAPS_ABLATE", "").split(",")))
    kern = functools.partial(_kernel_b, consts, s_max, NCH, use_prng, zt,
                             ablate)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((NCH, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((NCH, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((NCH, LANE, Q), F32),
        jax.ShapeDtypeStruct((NCH, LANE, Q), F32),
        jax.ShapeDtypeStruct((NCH, 16), F32),
    )
    if z_flat is not None:
        # caller-provided pair-term table (the sparse model's G,
        # models/sparse.kernel_tables)
        wz = to_slab_jmajor(z_flat)
    elif zt:
        # Z table (NB, k) computed exactly as the XLA model builds it
        # (models/dense.make_phase), so ztable-mode pair terms match
        # the oracle bit-for-bit
        NCH_, NR_, m2 = invS2.shape
        oo = (other_M[:, :, :, None] * other_M[:, :, None, :]).reshape(
            NCH_, m2, K * K)
        Z = jnp.einsum("crm,cmq->crq", invS2, oo,
                       preferred_element_type=F32).reshape(
            NCH_, NR_ * K, K)
        wz = to_slab_jmajor(Z)
    else:
        wz = to_slab_jmajor(invS2)
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec] * 9,
        out_specs=(vspec, vspec, vspec, vspec, vspec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uni, mass2, elem2, to_slab(M), to_slab(Y), to_slab(SQ),
      wz, other_M, scal)
    omass, oelem, oM2, oY2, ocnt = res
    oM = from_slab(oM2, NR, K)
    oY = from_slab(oY2, NR, K)

    atoms_out = AtomTable(mass=omass.reshape(NCH, C),
                          elem=oelem.astype(jnp.int32).reshape(NCH, C),
                          n=ocnt[:, 0].astype(jnp.int32))
    done = ocnt[:, 1].astype(jnp.int32)
    n_sweeps = ocnt[:, 2].astype(jnp.int32)
    counts = SweepCounts(processed=ocnt[:, 3:7].astype(jnp.int32),
                         accepted=ocnt[:, 7:11].astype(jnp.int32))
    return atoms_out, oM, oY, done, n_sweeps, counts


def _draw_uni(keys, offs, s_max, NCH, B):
    """Pre-draw the threefry uniform slabs, one (16, B) block per sweep
    per chain, continuing each chain's global sweep numbering — the
    exact stream ops/sweep.run_updates consumes."""

    def draw_chain(key, off):
        ks = jax.vmap(lambda i: jax.random.fold_in(key, off + i))(
            jnp.arange(s_max))
        return jax.vmap(lambda k2: jax.random.uniform(k2, (16, B), F32))(
            ks).reshape(s_max * 16, B)

    uni = jax.vmap(draw_chain)(keys, offs)  # (NCH, s_max*16, B)
    return jnp.swapaxes(uni, 0, 1)  # (s_max*16, NCH, B)


def run_updates_pallas(key, atoms: AtomTable, M, cache, temp, n_steps,
                       consts: SamplerConsts, mass: MassParams, *,
                       phase, invS2, other_M, s_max: int = 48,
                       interpret: bool = False, sweep_offset=None):
    """Drop-in analog of ops/sweep.run_updates for the dense model on one
    device (single chain = NCH=1 of the fused kernel). Returns
    (atoms, M, cache, done, n_sweeps, counts)."""
    B = consts.batch
    off = jnp.int32(0) if sweep_offset is None else sweep_offset
    uni = _draw_uni(key[None], off[None] if off.ndim == 0 else off,
                    s_max, 1, B)

    scal = jnp.stack([
        atoms.n.astype(F32),
        n_steps.astype(F32),
        jnp.asarray(temp, F32),
        mass.lam.astype(F32),
        mass.max_gibbs_mass.astype(F32),
    ]).reshape(1, 5)

    atoms_b = AtomTable(mass=atoms.mass[None], elem=atoms.elem[None],
                        n=atoms.n[None])
    a2, M2, Y2, done, ns, cnt = _call_kernel(
        uni, atoms_b, M[None], cache.Y[None], phase.SQ[None],
        invS2[None], other_M[None], scal, consts, s_max, interpret)

    from ..models.dense import DenseCache
    atoms_out = AtomTable(mass=a2.mass[0], elem=a2.elem[0], n=a2.n[0])
    counts = SweepCounts(processed=cnt.processed[0],
                         accepted=cnt.accepted[0])
    return (atoms_out, M2[0], DenseCache(Y=Y2[0]), done[0], ns[0],
            counts)


def run_updates_pallas_multi(keys, atoms: AtomTable, M, cache, temp,
                             n_steps, consts: SamplerConsts,
                             mass: MassParams, *, invS2, other_M,
                             s_max: int = 32, interpret: bool = False,
                             sweep_offsets=None):
    """Batched analog of run_updates_pallas: every array carries a
    leading chain axis; `keys` is (NCH, 2), `n_steps` (NCH,), MassParams
    fields (NCH,). All chains' sweeps run through the SAME fused ops
    (not python-unrolled per chain). Returns stacked results."""
    NCH = M.shape[0]
    B = consts.batch

    offs = (jnp.zeros((NCH,), jnp.int32) if sweep_offsets is None
            else sweep_offsets)
    # TPU fast path draws uniforms from the on-core PRNG inside the
    # kernel; interpret (CPU) mode keeps the pre-drawn threefry slabs
    use_prng = not interpret
    if use_prng:
        uni = jnp.zeros((16, 8, LANE), F32)  # unused dummy ref
        seeds = ((keys[:, 0] ^ keys[:, 1]).astype(jnp.int32)
                 & jnp.int32(0xFFFFFF))
    else:
        uni = _draw_uni(keys, offs, s_max, NCH, B)
        seeds = jnp.zeros((NCH,), jnp.int32)

    def mk_scal(n_atoms, budget, off2):
        return jnp.stack([
            n_atoms.astype(F32),
            budget.astype(F32),
            jnp.broadcast_to(jnp.asarray(temp, F32), (NCH,)),
            mass.lam.astype(F32).reshape(NCH),
            mass.max_gibbs_mass.astype(F32).reshape(NCH),
            (seeds ^ off2).astype(F32),
        ], axis=1)  # (NCH, 6)

    SQ = SQ_batched(cache, invS2, other_M)
    a2, M2, Y2, done, ns, cnt = _call_kernel(
        uni, atoms, M, cache.Y, SQ, invS2, other_M,
        mk_scal(atoms.n, n_steps, offs), consts, s_max, interpret,
        use_prng)

    # completion guarantee: if any chain's Poisson budget outran s_max
    # sweeps (rare — while_loop slack is free, so s_max is generous),
    # keep re-invoking with the uniform streams continued
    def unfinished(c):
        return jnp.any(c[3] < n_steps)

    def again(c):
        a2, M2, Y2, done, ns, cnt = c
        uni2 = (uni if use_prng
                else _draw_uni(keys, offs + ns, s_max, NCH, B))
        a3, M3, Y3, d3, ns3, cnt3 = _call_kernel(
            uni2, a2, M2, Y2, SQ, invS2, other_M,
            mk_scal(a2.n, n_steps - done, offs + ns), consts, s_max,
            interpret, use_prng)
        cnt4 = SweepCounts(processed=cnt.processed + cnt3.processed,
                           accepted=cnt.accepted + cnt3.accepted)
        return (a3, M3, Y3, done + d3, ns + ns3, cnt4)

    a2, M2, Y2, done, ns, cnt = jax.lax.while_loop(
        unfinished, again, (a2, M2, Y2, done, ns, cnt))
    from ..models.dense import DenseCache
    return a2, M2, DenseCache(Y=Y2), done, ns, cnt


def SQ_batched(cache, invS2, other_M):
    """SQ = invS2 @ other^2 per chain (the dense phase table)."""
    return jnp.einsum("crm,cmk->crk", invS2, other_M * other_M,
                      precision=jax.lax.Precision.HIGHEST)


def run_updates_pallas_tables_multi(keys, atoms: AtomTable, M, temp,
                                    n_steps, consts: SamplerConsts,
                                    mass: MassParams, *, SQ, Y0, Z_flat,
                                    other_M, s_max: int = 32,
                                    interpret: bool = False):
    """Batched analog of run_updates_pallas_tables: NCH chains' update
    calls on caller-provided per-chain tables (the sparse model's
    SQ/Y0/G — models/sparse.kernel_tables with a leading chain axis),
    fused into one kernel like run_updates_pallas_multi. Returns
    (atoms, M, done, n_sweeps, counts), all chain-stacked."""
    NCH = M.shape[0]
    B = consts.batch
    use_prng = not interpret
    if use_prng:
        uni = jnp.zeros((16, 8, LANE), F32)
        seeds = ((keys[:, 0] ^ keys[:, 1]).astype(jnp.int32)
                 & jnp.int32(0xFFFFFF))
    else:
        uni = _draw_uni(keys, jnp.zeros((NCH,), jnp.int32), s_max, NCH, B)
        seeds = jnp.zeros((NCH,), jnp.int32)

    def mk_scal(n_atoms, budget, off2):
        return jnp.stack([
            n_atoms.astype(F32),
            budget.astype(F32),
            jnp.broadcast_to(jnp.asarray(temp, F32), (NCH,)),
            mass.lam.astype(F32).reshape(NCH),
            mass.max_gibbs_mass.astype(F32).reshape(NCH),
            (seeds ^ off2).astype(F32),
        ], axis=1)  # (NCH, 6)

    def call(atoms_b, M_b, Y_b, budget, offs):
        uni_c = (uni if use_prng
                 else _draw_uni(keys, offs, s_max, NCH, B))
        return _call_kernel(
            uni_c, atoms_b, M_b, Y_b, SQ, SQ, other_M,
            mk_scal(atoms_b.n, budget, offs), consts, s_max, interpret,
            use_prng, Z_flat)

    a2, M2, Y2, done, ns, cnt = call(atoms, M, Y0, n_steps,
                                     jnp.zeros((NCH,), jnp.int32))

    def unfinished(c):
        return jnp.any(c[3] < n_steps)

    def again(c):
        a2, M2, Y2, done, ns, cnt = c
        a3, M3, Y3, d3, ns3, cnt3 = call(a2, M2, Y2, n_steps - done, ns)
        cnt4 = SweepCounts(processed=cnt.processed + cnt3.processed,
                           accepted=cnt.accepted + cnt3.accepted)
        return (a3, M3, Y3, done + d3, ns + ns3, cnt4)

    a2, M2, Y2, done, ns, cnt = jax.lax.while_loop(
        unfinished, again, (a2, M2, Y2, done, ns, cnt))
    return a2, M2, done, ns, cnt


def run_updates_pallas_tables(key, atoms: AtomTable, M, temp, n_steps,
                              consts: SamplerConsts, mass: MassParams,
                              *, SQ, Y0, Z_flat, other_M,
                              s_max: int = 48, interpret: bool = False):
    """Single-chain update call on CALLER-PROVIDED tables — the sparse
    model's TPU path (models/sparse.kernel_tables builds SQ/Y0/G so the
    dense sweep machinery evaluates the sparse closed forms exactly;
    the G table is forced as the pair-term/Y-update source).
    Returns (atoms, M, done, n_sweeps, counts) — the Y table is
    call-scoped (rebuilt from closed forms next call), so it is not
    returned."""
    B = consts.batch
    use_prng = not interpret
    if use_prng:
        uni = jnp.zeros((16, 8, LANE), F32)
        seed = ((key[0] ^ key[1]).astype(jnp.int32)
                & jnp.int32(0xFFFFFF))
    else:
        uni = _draw_uni(key[None], jnp.zeros((1,), jnp.int32), s_max, 1,
                        B)
        seed = jnp.int32(0)

    def call(atoms_b, M_b, Y_b, budget, off):
        scal = jnp.stack([
            atoms_b.n[0].astype(F32),
            budget.astype(F32),
            jnp.asarray(temp, F32),
            mass.lam.astype(F32),
            mass.max_gibbs_mass.astype(F32),
            (seed ^ off).astype(F32),
        ]).reshape(1, 6)
        uni_c = (uni if use_prng
                 else _draw_uni(key[None], off[None], s_max, 1, B))
        return _call_kernel(
            uni_c, atoms_b, M_b, Y_b, SQ[None], SQ[None], other_M[None],
            scal, consts, s_max, interpret, use_prng, Z_flat[None])

    atoms_b = AtomTable(mass=atoms.mass[None], elem=atoms.elem[None],
                        n=atoms.n[None])
    a2, M2, Y2, done, ns, cnt = call(atoms_b, M[None], Y0[None],
                                     n_steps, jnp.int32(0))

    def unfinished(c):
        return c[3][0] < n_steps

    def again(c):
        a2, M2, Y2, done, ns, cnt = c
        a3, M3, Y3, d3, ns3, cnt3 = call(a2, M2, Y2, n_steps - done[0],
                                         ns[0])
        cnt4 = SweepCounts(processed=cnt.processed + cnt3.processed,
                           accepted=cnt.accepted + cnt3.accepted)
        return (a3, M3, Y3, done + d3, ns + ns3, cnt4)

    a2, M2, Y2, done, ns, cnt = jax.lax.while_loop(
        unfinished, again, (a2, M2, Y2, done, ns, cnt))
    atoms_out = AtomTable(mass=a2.mass[0], elem=a2.elem[0], n=a2.n[0])
    counts = SweepCounts(processed=cnt.processed[0],
                         accepted=cnt.accepted[0])
    return atoms_out, M2[0], done[0], ns[0], counts
