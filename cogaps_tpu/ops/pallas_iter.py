"""Fused multi-iteration Pallas kernel: WHOLE MCMC iterations in-device.

The round-4 sweep kernel (ops/pallas_sweep.py) still pays per update
call: an XLA cache rebuild (Y/SQ/Z einsums), slab conversions of M and
Y, a Poisson budget draw, and a kernel launch — ~15-30% of iteration
time once the sweeps themselves got fast. This kernel runs N_IT
complete iterations (A rebuild -> A sweeps -> P rebuild -> P sweeps ->
posterior statistics) per launch with ZERO per-iteration XLA:

* conditional-table rebuilds are in-kernel per-rh-block matmuls over
  STATIC slab copies of D / invS2 (verified exact,
  tools/probe_rebuild.py):
    AP_blk = M2a_blk (128,k) x M2p (128,k) contracted over k,
    Y_blk  = R_blk (128,128) x M2p contracted lane-vs-sublane,
  so no transpose/relayout of dynamic state ever happens;
* the P sampler's pair-term table is rebuilt in ROW-MAJOR form
  Z2[s, j*k+c'] (symmetric in (j, c')) and consumed by the sweep's
  zt_rowmajor mode — again relayout-free;
* budgets are in-kernel normal-approximation Poisson draws
  (ops/rng.poisson_fast semantics) from the on-core PRNG;
* sampling-phase posterior accumulation (max-normalized, the
  GapsStatistics.h:130-149 scheme) runs on slab-shaped accumulators.

Constraints (the engine falls back to the per-call path otherwise):
n_samples <= 128 (P state lives in one row slab), no fixed matrix, no
snapshots/PUMP, and history recording happens at span boundaries
outside the kernel. The GIST-class production/bench configuration
satisfies all of these.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .atoms import AtomTable
from .sweep import MassParams, SamplerConsts
from .pallas_sweep import (F32, LANE, _bdot, _ndtri, _split3, _sweep_b,
                           _tri, slab_shape, _rup)

HI = jax.lax.Precision.HIGHEST


class _PhaseParts(NamedTuple):
    """What _sweep_b reads from its phase object."""

    SQ_parts: tuple
    WZ_parts: tuple
    other: jnp.ndarray
    colnz: jnp.ndarray


def _bdot_hi(a, b, ca, cb):
    return _bdot(a, b, ca, cb, HI)


def _rebuild_A(M2a, M2p, D2, inv2, RH, K, m):
    """SQ/Y slab tables for the A sampler from the current factors.
    D2/inv2 are (NCH, 128, RH*m): gene-row slabs with m sample lanes
    per block."""
    Mp_m = M2p[:, :m, :]
    Mp2 = Mp_m * Mp_m
    Ybs, SQbs = [], []
    for rh in range(RH):
        blk = M2a[:, :, rh * K:(rh + 1) * K]
        Db = D2[:, :, rh * m:(rh + 1) * m]
        ib = inv2[:, :, rh * m:(rh + 1) * m]
        AP = _bdot_hi(blk, Mp_m, 2, 2)  # (NCH, 128, m)
        R = (Db - AP) * ib
        Ybs.append(_bdot_hi(R, Mp_m, 2, 1))  # (NCH, 128, K)
        SQbs.append(_bdot_hi(ib, Mp2, 2, 1))
    return (jnp.concatenate(SQbs, axis=2),
            jnp.concatenate(Ybs, axis=2))


def _rebuild_P(M2a, M2p, D2, inv2, RH, K, m):
    """SQ/Y/Z tables for the P sampler, built ENTIRELY from the
    A-orientation tables by contracting the gene axis in sublane space
    (no transposed data copies): per gene block,
      Y_p[s, c] += sum_r R[r, s] M_a[r, c]  (contract sublanes),
      Z_p[s, c, c'] += sum_r inv[r, s] M_a[r, c] M_a[r, c'].
    Outputs are (NCH, m, ...) and sublane-padded to 128 by the
    caller-visible concat."""
    NCH = M2a.shape[0]
    Mp_m = M2p[:, :m, :]
    Yp = SQp = None
    Zcs = [None] * K
    for rh in range(RH):
        blk = M2a[:, :, rh * K:(rh + 1) * K]  # (NCH, 128 r, K)
        Db = D2[:, :, rh * m:(rh + 1) * m]  # (NCH, 128 r, m)
        ib = inv2[:, :, rh * m:(rh + 1) * m]
        AP = _bdot_hi(blk, Mp_m, 2, 2)  # (NCH, 128 r, m)
        R = (Db - AP) * ib
        Yb = _bdot_hi(R, blk, 1, 1)  # (NCH, m, K)
        SQb = _bdot_hi(ib, blk * blk, 1, 1)
        Yp = Yb if Yp is None else Yp + Yb
        SQp = SQb if SQp is None else SQp + SQb
        for c in range(K):
            Tc = ib * blk[:, :, c:c + 1]  # (NCH, 128 r, m)
            Zc = _bdot_hi(Tc, blk, 1, 1)  # (NCH, m, K)
            Zcs[c] = Zc if Zcs[c] is None else Zcs[c] + Zc
    pad = jnp.zeros((NCH, LANE - m, K), F32)
    Yp = jnp.concatenate([Yp, pad], axis=1)
    SQp = jnp.concatenate([SQp, pad], axis=1)
    Zp = jnp.concatenate(
        [jnp.concatenate([Zc, pad], axis=1) for Zc in Zcs], axis=2)
    # (NCH, 128, K*K), c-major == c'-major by symmetry (zt_rowmajor)
    return SQp, Yp, Zp


def _colnz_from_slab(M2, RH, K):
    """canUseGibbs per column from a slab factor: max over all row
    blocks -> (NCH, k, 1)."""
    m = None
    for rh in range(RH):
        blk = jnp.max(M2[:, :, rh * K:(rh + 1) * K], axis=1)  # (NCH,K)
        m = blk if m is None else jnp.maximum(m, blk)
    return (m > 0.0).astype(F32)[:, :, None]


def _prng_uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(
        (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000),
        jnp.float32) - 1.0


def _budget(lam):
    """In-kernel poisson_fast: round(N(lam, sqrt(lam))) clipped >= 0."""
    u = _prng_uniform(lam.shape)
    z = _ndtri(jnp.clip(u, 1e-7, 1.0 - 1e-7))
    return jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z), 0.0)


def _run_sweeps(consts, s_max, tri, state0, temp, n_steps_f, lam, mgm,
                phase, zt, zt_rowmajor, NCH):
    """In-kernel while_loop of sweeps with PRNG-drawn uniforms."""
    B = consts.batch

    def cond(carry):
        s, st = carry
        left = jnp.sum(jnp.maximum(n_steps_f - st[5], 0.0))
        return (s < s_max) & (left > 0.0)

    def body(carry):
        s, st = carry
        uni = _prng_uniform((16, NCH, B))
        st = _sweep_b(consts, uni, tri, st, temp, n_steps_f, lam, mgm,
                      phase, zt, zt_rowmajor)
        return (s + 1, st)

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))
    return out


def _kernel_span(consts_a, consts_p, NCH, n_it, phase_idx, n_iterations,
                 s_max_a, s_max_p, RH, K, m, accumulate,
                 D2pad_ref, inv2pad_ref, W2a_ref,
                 massa_ref, elema_ref, massp_ref, elemp_ref,
                 M2a_ref, M2p_ref, asum_ref, asq_ref, psum_ref, psq_ref,
                 scal_ref,
                 omassa_ref, oelema_ref, omassp_ref, oelemp_ref,
                 oM2a_ref, oM2p_ref, oasum_ref, oasq_ref, opsum_ref,
                 opsq_ref, ocnt_ref):
    B_a = consts_a.batch
    B_p = consts_p.batch
    tri_a = _tri(B_a)
    tri_p = tri_a if B_p == B_a else _tri(B_p)

    W2a_parts = _split3(W2a_ref[:])
    D2pad = D2pad_ref[:]
    inv2pad = inv2pad_ref[:]

    # scal columns: 0 n_atoms_a, 1 n_atoms_p, 2 it0, 3 seed,
    # 4 lam_a, 5 mgm_a, 6 lam_p, 7 mgm_p, 8 temp_override(<0: anneal)
    pltpu.prng_seed(jnp.sum(scal_ref[:, 3].astype(jnp.int32)))
    it0 = scal_ref[:, 2:3]  # (NCH, 1), same value per chain
    lam_a = scal_ref[:, 4:5]
    mgm_a = scal_ref[:, 5:6]
    lam_p = scal_ref[:, 6:7]
    mgm_p = scal_ref[:, 7:8]

    z1 = jnp.zeros((NCH, 1), F32)

    def it_body(i, carry):
        (ma, ea, na, mp, ep, np_, M2a, M2p, asum, asq, psum, psq,
         nstat, upd, cnts) = carry
        it = it0 + i.astype(F32)  # (NCH, 1)
        if phase_idx == 0:
            temp_b = jnp.minimum(1.0, 2.0 * it / float(n_iterations))
        else:
            temp_b = jnp.ones((NCH, 1), F32)

        n_a = _budget(jnp.maximum(na, 10.0))
        n_p = _budget(jnp.maximum(np_, 10.0))

        # ---- A phase ----
        SQ2a, Y2a = _rebuild_A(M2a, M2p, D2pad, inv2pad, RH, K, m)
        other_a = M2p[:, :m, :]
        phase_a = _PhaseParts(
            SQ_parts=_split3(SQ2a), WZ_parts=W2a_parts,
            other=other_a,
            colnz=(jnp.max(other_a, axis=1) > 0.0).astype(F32)[:, :,
                                                               None])
        st = (ma, ea, M2a, Y2a, na, z1, z1, z1, z1, z1, z1, z1, z1, z1,
              z1)
        st = _run_sweeps(consts_a, s_max_a, tri_a, st, temp_b, n_a,
                         lam_a, mgm_a, phase_a, False, False, NCH)
        (ma, ea, M2a, _, na, done_a, nsw_a, *cs_a) = st

        # ---- P phase ----
        SQ2p, Y2p, Z2p = _rebuild_P(M2a, M2p, D2pad, inv2pad, RH, K, m)
        phase_p = _PhaseParts(
            SQ_parts=_split3(SQ2p), WZ_parts=_split3(Z2p),
            other=M2p[:, :1, :],  # unused in zt mode (colnz explicit)
            colnz=_colnz_from_slab(M2a, RH, K))
        st = (mp, ep, M2p, Y2p, np_, z1, z1, z1, z1, z1, z1, z1, z1, z1,
              z1)
        st = _run_sweeps(consts_p, s_max_p, tri_p, st, temp_b, n_p,
                         lam_p, mgm_p, phase_p, True, True, NCH)
        (mp, ep, M2p, _, np_, done_p, nsw_p, *cs_p) = st

        upd = upd + done_a + done_p
        cnts = cnts + jnp.concatenate(
            [nsw_a, nsw_p] + list(cs_a) + list(cs_p), axis=1)

        # ---- posterior statistics (GapsStatistics.h:130-149) ----
        if accumulate:
            norm = jnp.max(M2p, axis=1)  # (NCH, K) col max over samples
            norm = jnp.where(norm == 0.0, 1.0, norm)
            q = M2p / norm[:, None, :]
            psum = psum + q
            psq = psq + q * q
            norm_t = jnp.concatenate([norm[:, None, :]] * RH, axis=2)
            prod = M2a * norm_t
            asum = asum + prod
            asq = asq + prod * prod
            nstat = nstat + 1.0

        return (ma, ea, na, mp, ep, np_, M2a, M2p, asum, asq, psum, psq,
                nstat, upd, cnts)

    if accumulate:
        acc0 = (asum_ref[:], asq_ref[:], psum_ref[:], psq_ref[:])
    else:
        # equilibration carries no accumulators (saves ~25 MB of
        # double-buffered VMEM)
        zk = jnp.zeros((NCH, 1, 1), F32)
        acc0 = (zk, zk, zk, zk)
    init = (massa_ref[:], elema_ref[:], scal_ref[:, 0:1],
            massp_ref[:], elemp_ref[:], scal_ref[:, 1:2],
            M2a_ref[:], M2p_ref[:], acc0[0], acc0[1],
            acc0[2], acc0[3], jnp.zeros((1, 1), F32),
            jnp.zeros((NCH, 1), F32), jnp.zeros((NCH, 18), F32))
    out = jax.lax.fori_loop(0, n_it, it_body, init)
    (ma, ea, na, mp, ep, np_, M2a, M2p, asum, asq, psum, psq, nstat,
     upd, cnts) = out
    if not accumulate:
        asum, asq = asum_ref[:], asq_ref[:]
        psum, psq = psum_ref[:], psq_ref[:]
    omassa_ref[:] = ma
    oelema_ref[:] = ea
    omassp_ref[:] = mp
    oelemp_ref[:] = ep
    oM2a_ref[:] = M2a
    oM2p_ref[:] = M2p
    oasum_ref[:] = asum
    oasq_ref[:] = asq
    opsum_ref[:] = psum
    opsq_ref[:] = psq
    ocnt_ref[:] = jnp.concatenate(
        [na, np_, upd, jnp.broadcast_to(nstat, (NCH, 1)), cnts], axis=1)


class FusedSpanData(NamedTuple):
    """Static per-run device tables for the fused span kernel."""

    D2pad: jnp.ndarray  # (NCH, 128, RH*m) gene-row slabs
    inv2pad: jnp.ndarray
    W2a: jnp.ndarray  # (NCH, 128, m*RH) j-major invS2 (A gather block)


def prepare_span_data(D, invS2):
    """Build the static slab tables from (NCH, G, S) data arrays."""
    NCH, G, S = D.shape
    RH = _rup(G, LANE) // LANE
    Gp = RH * LANE
    Dp = jnp.pad(D, ((0, 0), (0, Gp - G), (0, 0)))
    ip = jnp.pad(invS2, ((0, 0), (0, Gp - G), (0, 0)))
    # gene-row slabs, m sample lanes per block
    D2pad = Dp.reshape(NCH, RH, LANE, S).transpose(0, 2, 1, 3).reshape(
        NCH, LANE, RH * S)
    inv2pad = ip.reshape(NCH, RH, LANE, S).transpose(0, 2, 1, 3
                                                    ).reshape(
        NCH, LANE, RH * S)
    from .pallas_sweep import to_slab_jmajor
    W2a = to_slab_jmajor(invS2)
    return FusedSpanData(D2pad=D2pad, inv2pad=inv2pad, W2a=W2a)


def run_span_fused(span: FusedSpanData, atoms_a: AtomTable,
                   atoms_p: AtomTable, M2a, M2p, accum, seeds, it0,
                   n_it: int, phase_idx: int, consts_a: SamplerConsts,
                   consts_p: SamplerConsts, mass_a: MassParams,
                   mass_p: MassParams, *, n_iterations: int,
                   s_max_a: int = 48, s_max_p: int = 48,
                   accumulate: bool = False):
    """Run `n_it` full iterations in one pallas_call. State stays in
    slab form across calls. `accum` = (asum2, asq2, psum2, psq2).
    Returns (atoms_a, atoms_p, M2a, M2p, accum, n_stat_inc, done,
    counters (NCH, 18))."""
    NCH = M2a.shape[0]
    K = consts_a.k
    RH, Q = slab_shape(consts_a.n_rows, K)
    m = consts_a.m
    Ca, Cp = consts_a.capacity, consts_p.capacity

    scal = jnp.concatenate([
        atoms_a.n.astype(F32)[:, None],
        atoms_p.n.astype(F32)[:, None],
        jnp.broadcast_to(jnp.asarray(it0, F32), (NCH, 1)),
        seeds.astype(F32)[:, None],
        mass_a.lam.reshape(NCH, 1).astype(F32),
        mass_a.max_gibbs_mass.reshape(NCH, 1).astype(F32),
        mass_p.lam.reshape(NCH, 1).astype(F32),
        mass_p.max_gibbs_mass.reshape(NCH, 1).astype(F32),
    ], axis=1)

    kern = functools.partial(
        _kernel_span, consts_a, consts_p, NCH, n_it, phase_idx,
        n_iterations, s_max_a, s_max_p, RH, K, m, accumulate)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct
    out_shapes = (
        shp((NCH, Ca // LANE, LANE), F32),
        shp((NCH, Ca // LANE, LANE), F32),
        shp((NCH, Cp // LANE, LANE), F32),
        shp((NCH, Cp // LANE, LANE), F32),
        shp((NCH, LANE, Q), F32),
        shp((NCH, LANE, K), F32),
        shp((NCH, LANE, Q), F32),
        shp((NCH, LANE, Q), F32),
        shp((NCH, LANE, K), F32),
        shp((NCH, LANE, K), F32),
        shp((NCH, 22), F32),
    )
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec] * 14,
        out_specs=(vspec,) * 11,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(span.D2pad, span.inv2pad, span.W2a,
      atoms_a.mass.reshape(NCH, Ca // LANE, LANE),
      atoms_a.elem.astype(F32).reshape(NCH, Ca // LANE, LANE),
      atoms_p.mass.reshape(NCH, Cp // LANE, LANE),
      atoms_p.elem.astype(F32).reshape(NCH, Cp // LANE, LANE),
      M2a, M2p, accum[0], accum[1], accum[2], accum[3], scal)
    (ma, ea, mp, ep, oM2a, oM2p, asum, asq, psum, psq, ocnt) = res
    atoms_a2 = AtomTable(mass=ma.reshape(NCH, Ca),
                         elem=ea.astype(jnp.int32).reshape(NCH, Ca),
                         n=ocnt[:, 0].astype(jnp.int32))
    atoms_p2 = AtomTable(mass=mp.reshape(NCH, Cp),
                         elem=ep.astype(jnp.int32).reshape(NCH, Cp),
                         n=ocnt[:, 1].astype(jnp.int32))
    done = ocnt[:, 2].astype(jnp.int32)
    n_stat_inc = ocnt[0, 3].astype(jnp.int32)
    return (atoms_a2, atoms_p2, oM2a, oM2p, (asum, asq, psum, psq),
            n_stat_inc, done, ocnt[:, 4:])
