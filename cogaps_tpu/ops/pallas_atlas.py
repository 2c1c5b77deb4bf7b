"""Atlas-scale sparse-model sweep kernel: DMA-resident state, no tables.

The fused dense kernel (ops/pallas_sweep.py) keeps every per-row table
VMEM-resident, which caps it at NB = n_rows*k table rows that fit in
~100 MB of VMEM. The atlas configuration (SURVEY.md §7.10: 30k genes x
50k+ cells, k=50, sparse) needs G-table-equivalent state of 300-500 MB
per sampler — this kernel is the redesign for that regime, built on the
measured backend facts (tools/probe_dma*.py, PERF_NOTES.md round-5):

  * dynamic-offset DMA between HBM and VMEM costs ~40-175 ns per
    descriptor and runs at bandwidth for >=KB-sized rows;
  * one-hot transport matmuls scale with TABLE size, so they are kept
    only for the (VMEM-resident) atom tables;
  * XLA `take` of millions of rows runs at ~10 ns/row when chunked at
    ~1-4M rows — fast enough to rebuild per-phase gather planes, and
    catastrophically slow per-op inside the sweep (100-170 us each),
    which is why the sweep itself must not contain XLA gathers.

Data layout (built by parallel/atlas_engine.py):

  vcol plane  (PROWS, 128) f32, HBM.  Two CSR-ordered nonzeros per
      plane row ("paired" layout — HBM slices must be 128-lane):
      lanes [0,k)   = partner row other[idx_{2j}]   (values v_c)
      lane  61      = 1/d_{2j},  lane 62 = 1/d_{2j}^2
      lanes [64,64+k), 125, 126 = the same for nonzero 2j+1.
      Each data row's nonzeros start at an even position, so a row
      occupies plane rows [prow, prow + ceil(len/2)). Rebuilt from the
      frozen partner factor once per phase (the reference regenerates
      its lookup tables on the same schedule,
      /root/reference/src/gibbs_sampler/SparseNormalModel.cpp:294-311).
  M mirror    (NR, 128) f32, HBM, in-place updated by the kernel:
      lanes [0,k) = the sampled factor row M[r]; lane 120 = prow,
      121 = len (real nonzeros), 122 = nchunks = ceil(len/(2*SEG)).
  atoms       VMEM compact tables (ops/atoms.py layout), one-hot
      machinery reused from pallas_sweep.

Per sweep: proposals + exact first-wins conflicts (identical formulas
to ops/sweep.py — the differential oracle), then per-lane DMAs fetch
the M rows and plane segments of the <=2B proposal rows; every sparse
closed-form term (models/sparse.py, re-derived from
SparseNormalModel.cpp:153-292) reduces to masked matvec extractions of
per-(nonzero,half) scalars from the fetched segments; ap (the
reconstruction at nonzeros) is computed on the fly from the live M row,
so NO per-nonzero state is mutable within a phase and accepted updates
write back only the M row (row-disjointness makes the writes conflict-
free). Multi-chunk rows (len > 2*SEG) accumulate over a while_loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import rng as gaps_rng
from ..ops.atoms import AtomTable
from ..ops.sweep import MassParams, SamplerConsts, SweepCounts
from .pallas_sweep import (_BT, _gibbs_mass, _mm, _lanesum, _rup, _tri,
                           _draw_uni, BF16, F32, LANE, _PREC)

NOISE_EPS = 1.0e-6  # models/sparse.py NOISE_EPS
BETA = 100.0        # models/sparse.py BETA
EPS = float(gaps_rng.EPSILON)

# mirror metadata lanes
MROW_PROW = 120
MROW_LEN = 121
MROW_NCH = 122
# in-plane per-nonzero scalar lanes (per half: +64)
DR_LANE = 61
DR2_LANE = 62
NACC = 32  # width of the per-lane accumulator (see _sweep_atlas)


class AtlasParams(NamedTuple):
    group: int      # lanes fetched/reduced together
    seg: int        # plane rows per chunk (chunk covers 2*seg nonzeros)
    prows: int      # total plane rows (padded by seg)
    nsem: int = 16  # DMA semaphore ring size


def _colsel(lane_iota128, col_b1):
    """(B,128) 0/1 mask: lane % 64 == col (both halves selected)."""
    return ((lane_iota128 & 63) == col_b1).astype(F32)


def _matvec(x):
    """Row-sum (N, 128) -> (N, 1), exact enough (HIGHEST)."""
    return _mm(x, jnp.ones((x.shape[1], 1), F32))


def _sweep_atlas(consts: SamplerConsts, ap: AtlasParams, uni, tri, state,
                 temp, n_steps_f, lam, mgm, z2v, colnzv,
                 mmir, vcol, mb1, mb2, gb1, gb2, stgv, stgs, accv,
                 colv, accr, sem, wsem, ssem):
    """One batched sweep over (1, B) lanes. Proposal / conflict /
    acceptance / atom-table sections mirror ops/pallas_sweep._sweep_b
    (NCH=1) exactly; alpha terms come from DMA'd plane segments."""
    (mass2, elem2f, n_f, done_f, *cs) = state
    NR = consts.n_rows
    B = consts.batch
    C = consts.capacity
    K = consts.k
    NB = consts.n_bins
    G, SEG = ap.group, ap.seg
    NGRP = B // G
    GS = G * SEG

    u1, u2, u_gibbs, u_exp, u_acc = (uni[j] for j in range(5))
    ui0, ui1, ui2, ui3 = (uni[5 + j] for j in range(4))
    mm_rank = _mm

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(F32)
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

    t_a12 = _BT(jnp.concatenate([a1c, a2c], axis=1), C)
    elem_a12, m12 = t_a12.gather2(elem2f, mass2)
    elem_a1, elem_a2 = elem_a12[:, :B], elem_a12[:, B:]
    m1g, m2 = m12[:, :B], m12[:, B:]
    m1 = jnp.where(is_birth, 0.0, m1g)
    elem1 = jnp.where(is_birth, e_birth, jnp.maximum(elem_a1, 0.0))
    if consts.local_moves:
        W_f = jnp.maximum(1.0, jnp.floor(NB / n_c))
        t2m = ui3 * 2.0
        sgn = jnp.where(t2m < 1.0, -1.0, 1.0)
        frac = t2m - jnp.floor(t2m)
        mag = jnp.minimum(jnp.floor(frac * W_f) + 1.0, W_f)
        e_move = (elem1 + sgn * mag) % NB
    else:
        e_move = jnp.minimum(jnp.floor(ui3 * NB), float(NB - 1))
    elem2_ = jnp.where(is_move, e_move, jnp.maximum(elem_a2, 0.0))
    r1 = jnp.floor(elem1 / K)
    c1 = elem1 - r1 * K
    r2 = jnp.floor(elem2_ / K)
    c2 = elem2_ - r2 * K
    uses2 = is_move | is_exch
    uses_a1 = is_death | is_move | is_exch

    # ---- conflicts: exact first-wins on rows and atoms (identical to
    # _sweep_b / ops/sweep._keep) ----
    def blocked(v1m, v2m, q, mask3):
        c = ((v1m[:, :, None] == q[:, None, :])
             | (v2m[:, :, None] == q[:, None, :])) & mask3
        return jnp.max(c.astype(BF16), axis=1).astype(F32)

    iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (1, B, 2 * B), 1)
    iota_i2 = jax.lax.broadcasted_iota(jnp.int32, (1, B, 2 * B), 2)
    earlier2 = iota_j2 < (iota_i2 & (B - 1))

    r1m = jnp.where(active, r1, -1.0)
    r2m = jnp.where(active & uses2, r2, -3.0)
    rb = blocked(r1m, r2m, jnp.concatenate([r1, r2], axis=1), earlier2)
    keep = active & ~(rb[:, :B] > 0.0)
    keep &= ~uses2 | ~(rb[:, B:] > 0.0)
    a1m = jnp.where(active & uses_a1, a1c, -1.0)
    a2m = jnp.where(active & is_exch, a2c, -3.0)
    ab_ = blocked(a1m, a2m, jnp.concatenate([a1c, a2c], axis=1),
                  earlier2)
    keep &= ~uses_a1 | ~(ab_[:, :B] > 0.0)
    keep &= ~is_exch | ~(ab_[:, B:] > 0.0)

    pre_birth_rank = mm_rank((keep & is_birth).astype(F32), tri)
    keep &= ~is_birth | (n_f + pre_birth_rank - 1.0 < C)
    rank = mm_rank(keep.astype(F32), tri)
    keep &= rank <= remaining

    is_birth &= keep
    is_death &= keep
    is_move &= keep
    is_exch &= keep

    same_row = (r1 == r2).astype(F32)
    f1 = keep
    f2 = keep & uses2 & (same_row < 0.5)

    # ---- stage r/flags; fetch M-mirror rows ----
    stgv[0:1] = r1
    stgv[1:2] = r2
    stgv[2:3] = f1.astype(F32)
    stgv[3:4] = f2.astype(F32)
    # full-buffer staging copies: row-slices of an (8, B) f32 VMEM ref
    # break the (8,128) tile (Mosaic memref_slice error); unused rows
    # just carry stale values that the readers never consult
    cp = pltpu.make_async_copy(stgv, stgs, ssem)
    cp.start()
    cp.wait()

    def m_issue(j, car):
        rr1 = stgs[0, j].astype(jnp.int32)
        rr2 = stgs[1, j].astype(jnp.int32)

        @pl.when(stgs[2, j] > 0.0)
        def _():
            pltpu.make_async_copy(mmir.at[pl.ds(rr1, 1)],
                                  mb1.at[pl.ds(j, 1)],
                                  sem.at[j % ap.nsem]).start()

        @pl.when(stgs[3, j] > 0.0)
        def _():
            pltpu.make_async_copy(mmir.at[pl.ds(rr2, 1)],
                                  mb2.at[pl.ds(j, 1)],
                                  sem.at[j % ap.nsem]).start()

        return car

    def m_drain(j, car):
        rr1 = stgs[0, j].astype(jnp.int32)
        rr2 = stgs[1, j].astype(jnp.int32)

        @pl.when(stgs[2, j] > 0.0)
        def _():
            pltpu.make_async_copy(mmir.at[pl.ds(rr1, 1)],
                                  mb1.at[pl.ds(j, 1)],
                                  sem.at[j % ap.nsem]).wait()

        @pl.when(stgs[3, j] > 0.0)
        def _():
            pltpu.make_async_copy(mmir.at[pl.ds(rr2, 1)],
                                  mb2.at[pl.ds(j, 1)],
                                  sem.at[j % ap.nsem]).wait()

        return car

    jax.lax.fori_loop(0, B, m_issue, 0)
    jax.lax.fori_loop(0, B, m_drain, 0)

    M1 = mb1[:]  # (B, 128)
    M2 = mb2[:]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    vlane = (lane128 < K).astype(F32)
    sel_prow = (lane128 == MROW_PROW).astype(F32)
    sel_len = (lane128 == MROW_LEN).astype(F32)
    sel_nch = (lane128 == MROW_NCH).astype(F32)
    prow1c = _matvec(M1 * sel_prow)  # (B, 1)
    len1c = _matvec(M1 * sel_len)
    nch1c = _matvec(M1 * sel_nch)
    prow2c = _matvec(M2 * sel_prow)
    len2c = _matvec(M2 * sel_len)
    nch2c = _matvec(M2 * sel_nch)

    # lane -> sublane transposes of the column ids (exact: small ints)
    iB0 = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    iB1 = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    idB = (iB0 == iB1).astype(F32)  # identity (B, B)
    c1s = jax.lax.dot_general(idB, c1, (((0,), (1,)), ((), ())),
                              preferred_element_type=F32,
                              precision=_PREC)  # (B, 1)
    c2s = jax.lax.dot_general(idB, c2, (((0,), (1,)), ((), ())),
                              preferred_element_type=F32,
                              precision=_PREC)
    ohc1S = (lane128.astype(F32) == c1s).astype(F32)  # (B, 128)
    ohc2S = (lane128.astype(F32) == c2s).astype(F32)

    # Z2 terms from the VMEM (128, 128)-embedded Z2 (z2v) and colnz row
    Z2C1 = _mm(ohc1S, z2v)  # (B, 128): Z2[c1[b], :]
    Z2C2 = _mm(ohc2S, z2v)
    colb = jnp.broadcast_to(colnzv, (B, 128))  # colnz in lanes [0,k)

    # stage prow/nchunk for the plane DMA loops (sublane -> lane)
    meta = jnp.concatenate([prow1c, nch1c, prow2c, nch2c], axis=1)
    metaT = jax.lax.dot_general(meta, idB, (((0,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=_PREC)  # (4, B)
    stgv[4:8] = metaT
    cp2 = pltpu.make_async_copy(stgv, stgs, ssem)
    cp2.start()
    cp2.wait()

    # scalar max chunk count over fetched lanes
    def nmax_body(j, m):
        m = jnp.maximum(m, jnp.where(stgs[2, j] > 0.0, stgs[5, j], 1.0))
        return jnp.maximum(m, jnp.where(stgs[3, j] > 0.0, stgs[7, j],
                                        1.0))

    nmax = jax.lax.fori_loop(0, B, nmax_body, jnp.float32(1.0)
                             ).astype(jnp.int32)

    # per-lane sublane columns, packed into lanes of one (B, 128)
    # scratch ref so the group fori_loop can slice them dynamically:
    # lane 0 = len1, 1 = nch1, 2 = len2, 3 = nch2, 4 = c1, 5 = c2
    lane_b128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

    def _at(i):
        return (lane_b128 == i).astype(F32)

    colv[:] = (len1c * _at(0) + nch1c * _at(1) + len2c * _at(2)
               + nch2c * _at(3) + c1s * _at(4) + c2s * _at(5))
    accr[:] = jnp.zeros((B, 128), F32)

    # static per-group helpers
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (GS, 1), 0) % SEG
    lane_gs = jax.lax.broadcasted_iota(jnp.int32, (GS, 128), 1)
    half = (lane_gs >= 64).astype(jnp.int32)
    laneh = lane_gs & 63
    vmask_col = (laneh < K).astype(F32)
    dr_mask = (laneh == DR_LANE).astype(F32)
    dr2_mask = (laneh == DR2_LANE).astype(F32)
    lo_half = (lane_gs < 64).astype(F32)
    hi_half = 1.0 - lo_half
    # block map: row i of a group buffer belongs to lane i // SEG
    blk_of_row = jax.lax.broadcasted_iota(jnp.int32, (GS, G), 0) // SEG
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (GS, G), 1)
    blockmap = (blk_of_row == blk_iota).astype(F32)  # (GS, G)

    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    shift64 = (jj_ == ii + 64).astype(F32)

    lane_gs128 = lane_gs  # (GS, 128) iota, already built

    def group_reduce(gbuf, Mg, cblk_sel, len_blk, chk_off, nch_blk,
                     want_pair, lane_base):
        """Per-(nonzero,half) scalar extraction + closed-form partial
        sums for one group's fetched segments. Returns (G, 10):
        [sv2, st2, msum, esum, svd2, svdr2, smsame, sesame, apg, pad]
        (pair columns zero when want_pair is False)."""
        # validity per cell: column lane, position < len, chunk active
        # global nonzero position of each cell: chunk base + row
        # within segment, two nonzeros per plane row
        pos = ((chk_off * SEG + rowpos) * 2 + half).astype(F32)
        okc = (pos < len_blk) & (nch_blk > chk_off.astype(F32))
        vm = vmask_col * okc.astype(F32)
        dr_e = _matvec(gbuf * dr_mask * lo_half * okc.astype(F32))
        dr_o = _matvec(gbuf * dr_mask * hi_half * okc.astype(F32))
        dr2_e = _matvec(gbuf * dr2_mask * lo_half * okc.astype(F32))
        dr2_o = _matvec(gbuf * dr2_mask * hi_half * okc.astype(F32))
        # ap per half from the live M row of the owning lane
        # (M values live in lanes [0,k) of the mirror row)
        laneG = jax.lax.broadcasted_iota(jnp.int32, Mg.shape, 1)
        Mblk = _mm(blockmap, Mg * (laneG < K).astype(F32))  # (GS,128)
        ap_e = _matvec(gbuf * Mblk * vmask_col * lo_half
                       * okc.astype(F32))
        # hi half: gbuf hi-half values live in lanes [64,64+k); pair
        # them with M via a fixed 64-lane shift matmul
        Mhi = _mm(Mblk, shift64)  # lanes [64,128) = Mblk lanes [0,64)
        ap_o = _matvec(gbuf * Mhi * vmask_col * hi_half
                       * okc.astype(F32))
        selc1 = cblk_sel[0]  # (GS, 128) 0/1 of proposal column c1
        selc2 = cblk_sel[1]
        v1_e = _matvec(gbuf * selc1 * vm * lo_half)
        v1_o = _matvec(gbuf * selc1 * vm * hi_half)
        v2_e = _matvec(gbuf * selc2 * vm * lo_half)
        v2_o = _matvec(gbuf * selc2 * vm * hi_half)

        def halfsums(v, vB, drh, dr2h, aph):
            t1 = v * drh
            sv2 = v * v
            st2 = t1 * t1
            ms = t1 + (v - v * dr2h) * aph
            es = t1 + (v + v * dr2h) * aph
            if not want_pair:
                z = jnp.zeros_like(v)
                return sv2, st2, ms, es, z, z, z, z
            vd = v - vB
            svd2 = vd * vd
            svdr2 = (vd * drh) ** 2
            w = 1.0 - dr2h
            sms = vd * (aph * w + drh)
            ses = (v + vB) * (aph * (1.0 + dr2h) + drh)
            return sv2, st2, ms, es, svd2, svdr2, sms, ses

        se = halfsums(v1_e, v2_e, dr_e, dr2_e, ap_e)
        so = halfsums(v1_o, v2_o, dr_o, dr2_o, ap_o)
        parts = [a + b for a, b in zip(se, so)]  # 8 x (GS, 1)
        # lane-masked placement instead of an (GS, 8) concat + 8-lane
        # matmuls (8-lane matmul operands crash this compiler); the
        # blocksum contracts SUBLANES, the proven pattern
        stacked = parts[0] * (lane_gs128 == lane_base).astype(F32)
        for i, pt in enumerate(parts[1:], start=1):
            stacked = stacked + pt * (lane_gs128
                                      == lane_base + i).astype(F32)
        return jax.lax.dot_general(
            blockmap, stacked, (((0,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_PREC)  # (G, 128)

    # chunked fetch-reduce loop over plane segments. Groups iterate in
    # a lax.fori_loop (NOT python-unrolled): the unrolled body made the
    # Mosaic program ~NGRP x larger and pushed atlas-scale compiles
    # past 50 minutes. All per-group state lives in refs (mb1/mb2,
    # colv, accr) and is sliced with dynamic offsets.
    def group_body(g, chk):
        def p_issue(jj, car):
            j = g * G + jj

            @pl.when((stgs[2, j] > 0.0)
                     & (stgs[5, j] > chk.astype(F32)))
            def _():
                pp = stgs[4, j].astype(jnp.int32) + chk * SEG
                pltpu.make_async_copy(
                    vcol.at[pl.ds(pp, SEG)],
                    gb1.at[pl.ds(jj * SEG, SEG)],
                    sem.at[jj % ap.nsem]).start()

            @pl.when((stgs[3, j] > 0.0)
                     & (stgs[7, j] > chk.astype(F32)))
            def _():
                pp = stgs[6, j].astype(jnp.int32) + chk * SEG
                pltpu.make_async_copy(
                    vcol.at[pl.ds(pp, SEG)],
                    gb2.at[pl.ds(jj * SEG, SEG)],
                    sem.at[(jj + 7) % ap.nsem]).start()

            return car

        def p_drain(jj, car):
            j = g * G + jj

            @pl.when((stgs[2, j] > 0.0)
                     & (stgs[5, j] > chk.astype(F32)))
            def _():
                pp = stgs[4, j].astype(jnp.int32) + chk * SEG
                pltpu.make_async_copy(
                    vcol.at[pl.ds(pp, SEG)],
                    gb1.at[pl.ds(jj * SEG, SEG)],
                    sem.at[jj % ap.nsem]).wait()

            @pl.when((stgs[3, j] > 0.0)
                     & (stgs[7, j] > chk.astype(F32)))
            def _():
                pp = stgs[6, j].astype(jnp.int32) + chk * SEG
                pltpu.make_async_copy(
                    vcol.at[pl.ds(pp, SEG)],
                    gb2.at[pl.ds(jj * SEG, SEG)],
                    sem.at[(jj + 7) % ap.nsem]).wait()

            return car

        jax.lax.fori_loop(0, G, p_issue, 0)
        jax.lax.fori_loop(0, G, p_drain, 0)

        chk_off = jnp.broadcast_to(chk, (GS, 1)).astype(jnp.int32)
        Mg1 = mb1[pl.ds(g * G, G)]
        Mg2 = mb2[pl.ds(g * G, G)]
        cg = colv[pl.ds(g * G, G)]  # (G, 128)

        # fresh (G, 128) lane iota: SLICING the sublane dim of a
        # lane-iota crashes the compiler (its layout is sublane-
        # compressed to one tile: "limits[i] <= dim(i)")
        lane_g128 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)

        def col(i):
            return _mm(cg * (lane_g128 == i).astype(F32),
                       jnp.ones((128, 1), F32))

        len1b = _mm(blockmap, col(0))
        nch1b = _mm(blockmap, col(1))
        len2b = _mm(blockmap, col(2))
        nch2b = _mm(blockmap, col(3))
        c1b = _mm(blockmap, col(4))
        c2b = _mm(blockmap, col(5))
        sel1 = (laneh.astype(F32) == c1b).astype(F32)
        sel2 = (laneh.astype(F32) == c2b).astype(F32)
        r1g = group_reduce(gb1[:], Mg1, (sel1, sel2), len1b,
                           chk_off, nch1b, True, 0)
        r2g = group_reduce(gb2[:], Mg2, (sel2, sel2), len2b,
                           chk_off, nch2b, False, 8)
        accr[pl.ds(g * G, G)] = (accr[pl.ds(g * G, G)] + r1g + r2g)
        return chk

    import os as _os
    _unroll = _os.environ.get("COGAPS_ATLAS_UNROLL", "0") == "1"

    def chunk_body(chk):
        if _unroll:
            for g in range(NGRP):
                group_body(jnp.int32(g), chk)
        else:
            jax.lax.fori_loop(0, NGRP, group_body, chk)
        return chk + 1

    def chunk_cond(chk):
        return chk < nmax

    jax.lax.while_loop(chunk_cond, chunk_body, jnp.int32(0))
    accs = accr[:]  # (B, 128): lanes 0-7 = stream1 sums, 8-15 = stream2

    # Z-side per-lane quantities (sublane (B,1))
    mz1 = _matvec(M1 * Z2C1 * vlane)
    mzx = _matvec(M1 * Z2C2 * vlane)
    mz2 = _matvec(M2 * Z2C2 * vlane)
    z1c1 = _matvec(ohc1S * Z2C1)
    z1c2 = _matvec(ohc2S * Z2C2)
    z2c12 = _matvec(ohc2S * Z2C1)
    can1c = _matvec(ohc1S * colb)
    can2c = _matvec(ohc2S * colb)
    old1c = _matvec(M1 * ohc1S * vlane)
    old2c = _matvec(M2 * ohc2S * vlane)
    # lane-placed extras at lanes 16-25 of the (B, 128) accumulator
    # (no small-lane concats — 8-lane operands crash this compiler)
    extras = (mz1, mzx, mz2, z1c1, z1c2, z2c12, can1c, can2c, old1c,
              old2c)
    allcols = accs
    for i, e in enumerate(extras):
        allcols = allcols + e * _at(16 + i)
    # sublane -> lane: (B, 128) -> (128, B)
    rowsT_mm = jax.lax.dot_general(allcols, idB, (((0,), (0,)), ((), ())),
                                   preferred_element_type=F32,
                                   precision=_PREC)
    # roundtrip through VMEM: sublane slices of a matmul result carry
    # sublane-offset layouts that poison downstream lane-concatenates
    # (Mosaic "offset mismatch"); ref loads come back canonical
    accv[:] = rowsT_mm
    # column layout: acc1[0:8] | acc2[8:16] (only 8..11 used — its
    # pair columns are structural zeros) | extra[16:26].
    # Each row is loaded individually FROM THE REF: slicing the loaded
    # array (or the matmul result) yields sublane-offset layouts that
    # Mosaic's lane-concatenate refuses to mix downstream.
    (sv1sq, st1sq, msum1, esum1, svd2, svdr2, smsame, sesame,
     sv2sq, st2sq, msum2, esum2) = (accv[i:i + 1] for i in range(12))
    (mz1L, mzxL, mz2L, z1c1L, z1c2L, z2c12L, can1L, can2L, old1L,
     old2L) = (accv[16 + i:17 + i] for i in range(10))

    # ---- sparse closed forms (models/sparse.py, stable regrouping) ----
    s1 = BETA * (jnp.maximum(z1c1L - sv1sq, 0.0) + st1sq)
    smu1 = BETA * (-mz1L + msum1)
    err1 = NOISE_EPS * BETA * (mz1L + esum1)
    s2 = BETA * (jnp.maximum(z1c2L - sv2sq, 0.0) + st2sq)
    smu2 = BETA * (-mz2L + msum2)
    err2 = NOISE_EPS * BETA * (mz2L + esum2)
    s_same = BETA * (jnp.maximum(z1c1L - 2.0 * z2c12L + z1c2L - svd2,
                                 0.0) + svdr2)
    smu_same = BETA * (-(mz1L - mzxL) + smsame)
    err_same = NOISE_EPS * BETA * ((mz1L + mzxL) + sesame)
    s_pair = jnp.where(same_row > 0.5, s_same, s1 + s2)
    smu_pair = jnp.where(same_row > 0.5, smu_same, smu1 - smu2)
    err_pair = jnp.where(same_row > 0.5, err_same, err1 + err2)
    old1 = old1L
    # same-row stream2 old value comes from the row-1 M buffer at c2
    old2_same = _matvec(M1 * ohc2S * vlane)
    old2_sameL = jax.lax.dot_general(
        old2_same, idB, (((0,), (0,)), ((), ())),
        preferred_element_type=F32, precision=_PREC)
    old2 = jnp.where(same_row > 0.5, old2_sameL, old2L)

    can1 = can1L > 0.5
    can2 = can2L > 0.5
    log_u = jnp.log(jnp.maximum(u_acc, F32(1e-37)))
    rel1 = jnp.abs(smu1) > err1
    rel_pair = jnp.abs(smu_pair) > err_pair

    # ---- stacked Gibbs draws + acceptance (identical to _sweep_b) ----
    d_s = s1 * temp
    d_smu = (smu1 + m1 * s1) * temp
    p_s = s_pair * temp
    p_smu = smu_pair * temp
    ones_b = jnp.ones_like(m1)
    zero_b = m1 * 0.0
    # Mosaic's lane-concatenate refuses operand lists whose layouts
    # mix sublane offsets (e.g. a scal-derived scalar broadcast beside
    # a computed tensor). Every concat below is therefore a SAME-TENSOR
    # triple (uniform layout by construction); segment-dependent values
    # are selected afterwards with `where` on a 3B iota, which relayouts
    # freely.
    m1_3 = jnp.concatenate([m1] * 3, axis=1)
    m2_3 = jnp.concatenate([m2] * 3, axis=1)
    zero3 = m1_3 * 0.0
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * B), 1)
    seg2 = lane3 >= 2 * B
    gm_stk, gok_stk = _gibbs_mass(
        jnp.concatenate([u_gibbs] * 3, axis=1),
        jnp.concatenate([s1 * temp, d_s, p_s], axis=1),
        jnp.concatenate([smu1 * temp, d_smu, p_smu], axis=1),
        jnp.where(seg2, -m1_3, 0.0),
        jnp.where(seg2, m2_3, mgm + zero3),
        jnp.where(seg2, 0.0, lam + zero3))
    gokf = gok_stk.astype(F32)
    g_mass, g_ok = gm_stk[:, :B], gokf[:, :B] > 0.5
    d_gm, d_gok = gm_stk[:, B:2 * B], gokf[:, B:2 * B] > 0.5
    x_mass, x_ok = gm_stk[:, 2 * B:], gokf[:, 2 * B:] > 0.5

    e_mass = -jnp.log(jnp.maximum(u_exp, F32(1e-30))) / lam
    b_mass = jnp.where(can1, g_mass, e_mass)
    b_has = ~can1 | (g_ok & rel1)
    birth_acc = is_birth & b_has & (b_mass > F32(EPS))

    rel_d = jnp.abs(smu1 + m1 * s1) > err1
    rebirth = jnp.where(can1 & d_gok & rel_d, d_gm, m1)
    dll_death = rebirth * (d_smu - d_s * rebirth * 0.5)
    death_rebirth = is_death & (log_u < dll_death)
    death_kill = is_death & ~(log_u < dll_death)

    same_elem = elem1 == elem2_
    dll_move = -m1 * (p_smu + p_s * m1 * 0.5)
    move_acc = is_move & ~same_elem & (log_u < dll_move)

    b_sb = jnp.maximum((m1 + m2) * lam, F32(1e-6))
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

    d1 = jnp.where(birth_acc, b_mass, 0.0)
    d1 = jnp.where(death_kill, -m1, d1)
    d1 = jnp.where(death_rebirth, rebirth - m1, d1)
    d1 = jnp.where(move_acc, -m1, d1)
    d1 = jnp.where(ex_acc & ~same_elem, nm1 - m1, d1)
    v1m = birth_acc | death_kill | death_rebirth | move_acc | ex_acc
    d2 = jnp.where(move_acc, m1, 0.0)
    d2 = jnp.where(ex_acc & ~same_elem, nm2 - m2, d2)
    v2m = move_acc | ex_acc

    # ---- M-row updates + write-backs (no Y table in this regime) ----
    act1 = jnp.where(v1m, jnp.maximum(old1 + d1, 0.0) - old1, 0.0)
    act2 = jnp.where(v2m, jnp.maximum(old2 + d2, 0.0) - old2, 0.0)
    # two separate transposes: lane-slicing one stacked matmul result
    # trips Mosaic's "offset mismatch on non-concat dimension"
    act1s = jax.lax.dot_general(idB, act1, (((0,), (1,)), ((), ())),
                                preferred_element_type=F32,
                                precision=_PREC)  # (B, 1)
    act2s = jax.lax.dot_general(idB, act2, (((0,), (1,)), ((), ())),
                                preferred_element_type=F32,
                                precision=_PREC)
    sameS = jax.lax.dot_general(idB, same_row, (((0,), (1,)), ((), ())),
                                preferred_element_type=F32,
                                precision=_PREC)
    mb1[:] = M1 + act1s * ohc1S + sameS * act2s * ohc2S
    mb2[:] = M2 + (1.0 - sameS) * act2s * ohc2S

    wb1 = v1m
    wb2 = v2m & (same_row < 0.5)
    stgv[2:3] = wb1.astype(F32)
    stgv[3:4] = wb2.astype(F32)
    cp3 = pltpu.make_async_copy(stgv, stgs, ssem)
    cp3.start()
    cp3.wait()

    def w_issue(j, car):
        rr1 = stgs[0, j].astype(jnp.int32)
        rr2 = stgs[1, j].astype(jnp.int32)

        @pl.when(stgs[2, j] > 0.0)
        def _():
            pltpu.make_async_copy(mb1.at[pl.ds(j, 1)],
                                  mmir.at[pl.ds(rr1, 1)],
                                  wsem.at[j % ap.nsem]).start()

        @pl.when(stgs[3, j] > 0.0)
        def _():
            pltpu.make_async_copy(mb2.at[pl.ds(j, 1)],
                                  mmir.at[pl.ds(rr2, 1)],
                                  wsem.at[j % ap.nsem]).start()

        return car

    def w_drain(j, car):
        rr1 = stgs[0, j].astype(jnp.int32)
        rr2 = stgs[1, j].astype(jnp.int32)

        @pl.when(stgs[2, j] > 0.0)
        def _():
            pltpu.make_async_copy(mb1.at[pl.ds(j, 1)],
                                  mmir.at[pl.ds(rr1, 1)],
                                  wsem.at[j % ap.nsem]).wait()

        @pl.when(stgs[3, j] > 0.0)
        def _():
            pltpu.make_async_copy(mb2.at[pl.ds(j, 1)],
                                  mmir.at[pl.ds(rr2, 1)],
                                  wsem.at[j % ap.nsem]).wait()

        return car

    jax.lax.fori_loop(0, B, w_issue, 0)
    jax.lax.fori_loop(0, B, w_drain, 0)

    # ---- atom table writes + swap-with-back compaction (_sweep_b) ----
    write_a1 = death_kill | death_rebirth | move_acc | ex_acc
    mass_v1 = jnp.where(death_kill, 0.0,
                        jnp.where(death_rebirth, rebirth,
                                  jnp.where(ex_acc, nm1, m1)))
    elem_v1 = jnp.where(death_kill, -1.0, jnp.where(move_acc, elem2_,
                                                    elem1))
    birth_rank = mm_rank(birth_acc.astype(F32), tri)
    bslot = n_f + birth_rank - 1.0
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
    rank_to_src = _BT(jnp.minimum(f_rank, Bp - 1.0), Bp, t_filler).set(
        jnp.zeros((1, Bp // LANE, LANE), F32), t_slot)
    src = _BT(jnp.minimum(h_rank, Bp - 1.0), Bp).gather(rank_to_src)
    tsrc = _BT(jnp.minimum(src, float(C - 1)), C)
    fill_elem, fill_mass = tsrc.gather2(elem2f, mass2)
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
    return (mass2, elem2f, n_new, done_f + n_processed, *new_cs)


def _kernel_atlas(consts, ap: AtlasParams, s_max, use_prng,
                  uni_ref, mass_ref, elem_ref, z2_ref, colnz_ref,
                  scal_ref, mmir_in, vcol_ref,
                  omass_ref, oelem_ref, ocnt_ref, mmir_ref,
                  mb1, mb2, gb1, gb2, stgv, stgs, accv, colv, accr,
                  sem, wsem, ssem):
    """Whole update call: while_loop over sweeps, all addressing by
    DMA. mmir_ref is the aliased in/out M mirror in HBM."""
    B = consts.batch
    del mmir_in  # aliased to mmir_ref; all access via the output ref
    tri = _tri(B)
    z2v = z2_ref[:]
    colnzv = colnz_ref[:]

    # scal lives in SMEM: every engine scalar enters vector arithmetic
    # as a TRUE scalar, so broadcasts get canonical layouts (VMEM-row
    # scalars carry sublane offsets that poison lane-concatenates)
    n0 = jnp.full((1, 1), scal_ref[0, 0], F32)
    n_steps_f = scal_ref[0, 1]
    temp = scal_ref[0, 2]
    lam = scal_ref[0, 3]
    mgm = scal_ref[0, 4]

    # first-sweep hygiene: stale scratch may hold non-finite bits
    mb1[:] = jnp.zeros_like(mb1)
    mb2[:] = jnp.zeros_like(mb2)
    gb1[:] = jnp.zeros_like(gb1)
    gb2[:] = jnp.zeros_like(gb2)

    if use_prng:
        pltpu.prng_seed(scal_ref[0, 5].astype(jnp.int32))

    def cond(carry):
        s, st = carry
        done_f = st[3]
        left = jnp.sum(jnp.maximum(n_steps_f - done_f, 0.0))
        return (s < s_max) & (left > 0.0)

    def body(carry):
        s, st = carry
        if use_prng:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((16, 1, B)), jnp.uint32)
            uni = pltpu.bitcast(
                (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000),
                jnp.float32) - 1.0
        else:
            uni = uni_ref[pl.ds(s * 16, 16)]
        st = _sweep_atlas(consts, ap, uni, tri, st, temp, n_steps_f,
                          lam, mgm, z2v, colnzv, mmir_ref, vcol_ref,
                          mb1, mb2, gb1, gb2, stgv, stgs, accv,
                          colv, accr, sem, wsem, ssem)
        return (s + 1, st)

    z = jnp.zeros((1, 1), F32)
    init = (mass_ref[:], elem_ref[:], n0, z, z, z, z, z, z, z, z, z, z)
    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    (mass2, elem2f, n_f, done_f, *cs) = out
    omass_ref[:] = mass2
    oelem_ref[:] = elem2f
    cnt = jnp.concatenate([n_f, done_f] + list(cs)
                          + [jnp.zeros((1, 5), F32)], axis=1)
    ocnt_ref[:] = cnt


def call_atlas_kernel(uni, atoms: AtomTable, mmir, vcol, z2v, colnzv,
                      scal, consts: SamplerConsts, ap: AtlasParams,
                      s_max: int, interpret: bool = False,
                      use_prng: bool = True):
    """One update-call dispatch. atoms tables are (C,) flat; mmir is
    the (NR, 128) HBM mirror (returned updated); vcol the plane."""
    C = consts.capacity
    B = consts.batch
    G, SEG = ap.group, ap.seg
    mass2 = atoms.mass.reshape(1, C // LANE, LANE)
    elem2 = atoms.elem.astype(F32).reshape(1, C // LANE, LANE)

    kern = functools.partial(_kernel_atlas, consts, ap, s_max,
                             use_prng and not interpret)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = (
        jax.ShapeDtypeStruct((1, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((1, C // LANE, LANE), F32),
        jax.ShapeDtypeStruct((1, 16), F32),
        jax.ShapeDtypeStruct(mmir.shape, F32),
    )
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec, vspec, vspec, vspec, vspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM), aspec,
                  aspec],
        out_specs=(vspec, vspec, vspec, aspec),
        input_output_aliases={6: 3},
        scratch_shapes=[
            pltpu.VMEM((B, 128), F32), pltpu.VMEM((B, 128), F32),
            pltpu.VMEM((G * SEG, 128), F32),
            pltpu.VMEM((G * SEG, 128), F32),
            pltpu.VMEM((8, B), F32), pltpu.SMEM((8, B), F32),
            pltpu.VMEM((128, B), F32),
            pltpu.VMEM((B, 128), F32),
            pltpu.VMEM((B, 128), F32),
            pltpu.SemaphoreType.DMA((ap.nsem,)),
            pltpu.SemaphoreType.DMA((ap.nsem,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(uni, mass2, elem2, z2v, colnzv, scal, mmir, vcol)
    omass, oelem, ocnt, mmir_out = res
    atoms_out = AtomTable(mass=omass.reshape(C),
                          elem=oelem.astype(jnp.int32).reshape(C),
                          n=ocnt[0, 0].astype(jnp.int32))
    done = ocnt[0, 1].astype(jnp.int32)
    n_sweeps = ocnt[0, 2].astype(jnp.int32)
    counts = SweepCounts(processed=ocnt[0, 3:7].astype(jnp.int32),
                         accepted=ocnt[0, 7:11].astype(jnp.int32))
    return atoms_out, mmir_out, done, n_sweeps, counts


def run_updates_atlas(key, atoms: AtomTable, mmir, vcol, z2v, colnzv,
                      temp, n_steps, consts: SamplerConsts,
                      mass: MassParams, ap: AtlasParams,
                      s_max: int = 64, interpret: bool = False):
    """Full update call with the budget-completion loop (re-dispatch
    while any budget remains, continuing the uniform stream)."""
    B = consts.batch
    use_prng = not interpret
    if use_prng:
        uni = jnp.zeros((16, 1, B), F32)
        seed = ((key[0] ^ key[1]).astype(jnp.int32) & jnp.int32(0xFFFFFF))
    else:
        uni = _draw_uni(key[None], jnp.zeros((1,), jnp.int32), s_max, 1,
                        B)
        seed = jnp.int32(0)

    def mk_scal(n_atoms, budget, off):
        return jnp.stack([
            n_atoms.astype(F32), budget.astype(F32),
            jnp.asarray(temp, F32), mass.lam.astype(F32),
            mass.max_gibbs_mass.astype(F32),
            (seed ^ off).astype(F32),
        ]).reshape(1, 6)

    def call(atoms_b, mmir_b, budget, off):
        uni_c = (uni if use_prng
                 else _draw_uni(key[None], off[None], s_max, 1, B))
        return call_atlas_kernel(
            uni_c, atoms_b, mmir_b, vcol, z2v, colnzv,
            mk_scal(atoms_b.n, budget, off), consts, ap, s_max,
            interpret, use_prng)

    a2, mm2, done, ns, cnt = call(atoms, mmir, n_steps, jnp.int32(0))

    def unfinished(c):
        return c[2] < n_steps

    def again(c):
        a2, mm2, done, ns, cnt = c
        a3, mm3, d3, ns3, cnt3 = call(a2, mm2, n_steps - done, ns)
        cnt4 = SweepCounts(processed=cnt.processed + cnt3.processed,
                           accepted=cnt.accepted + cnt3.accepted)
        return (a3, mm3, done + d3, ns + ns3, cnt4)

    a2, mm2, done, ns, cnt = jax.lax.while_loop(
        unfinished, again, (a2, mm2, done, ns, cnt))
    return a2, mm2, done, ns, cnt
