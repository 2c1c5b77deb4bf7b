"""Dense normal data model — TPU formulation.

Capability parity with the reference's DenseNormalModel
(reference: src/gibbs_sampler/DenseNormalModel.{h,cpp}), re-derived for
batched evaluation instead of per-proposal SIMD loops:

The reference computes, per proposal at factor element (r, c), over the
full data row (DenseNormalModel.cpp:162-183):

    s    = sum_i other[i,c]^2            / S[r,i]^2
    s_mu = sum_i other[i,c]*(D - AP)[r,i] / S[r,i]^2

TPU re-derivation (SURVEY.md §7.3):
  * `other` is frozen for the duration of a sampler's update phase
    (samplers alternate, reference: GapsRunner.cpp:202-222), so ALL s
    values are one MXU matmul per phase:  SQ = invS2 @ (other * other),
    and per-proposal s is a scalar gather SQ[r, c].
  * s_mu is a row-dot of the maintained residual R = (D - AP) * invS2
    against other[:, c] — a batched (B, m) gather + VPU reduction.
  * rank-1 AP updates (DenseNormalModel.cpp:243-258) become masked
    scatter-adds of per-proposal row contributions into R.
  * alphaParametersWithChange(r, c, ch) (cpp:217-240) reduces to the
    identity s_mu' = s_mu - ch * s — no extra reduction needed.
  * the two-element alphaParameters (cpp:186-214) satisfies
    s_mu(pair) = s_mu1 - s_mu2 (the sign flip is AlphaParameters::operator+,
    AlphaParameters.cpp:11-14); s(pair) = s1 + s2 for distinct rows, and
    s1 + s2 - 2*X for a shared row, where X = sum_i o1*o2*invS2[r,i].

The uncertainty default is S = max(0.1*D, 0.1)
(reference: DenseNormalModel.h:73, MatrixMath.cpp:74-82); we precompute
invS2 = 1/S^2 once. lambda = alpha * sqrt(k / mean_nonzero(D)) and
maxGibbsMass scales by 1/lambda (reference: DenseNormalModel.h:79-81).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DenseCache:
    """Mutable per-sampler model state (beyond the factor matrix itself):
    the residual R = (D - M @ other^T) * invS2, maintained incrementally
    exactly like the reference's AP cache (DenseNormalModel.h:60)."""

    R: jnp.ndarray  # (n_rows, m) float32


class DensePhase(NamedTuple):
    """Per-update-phase constants: everything derived from the *frozen*
    partner factor (recomputed after each sync, reference:
    DenseNormalModel.cpp:20-36)."""

    SQ: jnp.ndarray  # (n_rows, k) = invS2 @ other^2  — all s values
    otherT: jnp.ndarray  # (k, m) transpose of partner factor
    col_nz: jnp.ndarray  # (k,) bool — canUseGibbs per column (cpp:100-103)


class AlphaBatch(NamedTuple):
    """Batched alphaParameters. err1/err_pair are fp32 noise-floor
    estimates for smu1/smu_pair: when |smu| falls below its floor the
    value is rounding noise and Gibbs draws must fail (the conditioning
    analog of the reference's far-tail OptionalFloat failure). The dense
    model stores its residual post-cancellation so its floor is ~0; the
    sparse closed form reconstructs large cancelling sums per proposal
    and supplies real floors (models/sparse.py)."""

    s1: jnp.ndarray
    smu1: jnp.ndarray
    s_pair: jnp.ndarray
    smu_pair: jnp.ndarray
    err1: jnp.ndarray = jnp.float32(0.0)
    err_pair: jnp.ndarray = jnp.float32(0.0)


def default_uncertainty(D: np.ndarray) -> np.ndarray:
    """S = pmax(0.1*D, 0.1) (reference: DenseNormalModel.h:73)."""
    return np.maximum(0.1 * D, 0.1).astype(np.float32)


def compute_lambda(D: np.ndarray, alpha: float, n_patterns: int) -> float:
    """lambda = alpha*sqrt(k/meanNonZero(D)) (reference: DenseNormalModel.h:79-80)."""
    nz = D[D != 0]
    mean_nz = float(nz.mean()) if nz.size else 1.0
    return float(alpha) * float(np.sqrt(n_patterns / mean_nz))


def make_phase(invS2: jnp.ndarray, other_M: jnp.ndarray,
               axis_name=None) -> DensePhase:
    """`axis_name` handles gene-sharded runs (parallel/sharded.py): the
    partner factor's rows live across devices, so the per-phase reductions
    (SQ, canUseGibbs) are psum/pmax collectives over the mesh axis."""
    sq = jnp.dot(invS2, other_M * other_M, preferred_element_type=jnp.float32)
    col_max = jnp.max(other_M, axis=0)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
        col_max = jax.lax.pmax(col_max, axis_name)
    return DensePhase(
        SQ=sq,
        otherT=other_M.T,
        col_nz=col_max > 0.0,
    )


def rebuild_cache(D: jnp.ndarray, invS2: jnp.ndarray, M: jnp.ndarray,
                  other_M: jnp.ndarray) -> DenseCache:
    """Exact residual rebuild — the analog of extraInitialization's full
    AP = M @ other^T recompute (reference: DenseNormalModel.cpp:38-54)."""
    ap = jnp.dot(M, other_M.T, preferred_element_type=jnp.float32)
    return DenseCache(R=(D - ap) * invS2)


def alpha_batch(cache: DenseCache, phase: DensePhase, invS2: jnp.ndarray,
                addr, axis_name=None) -> AlphaBatch:
    """Batched alphaParameters for B proposals (single + pair forms),
    fully gather-free: all row access is one-hot matmul through
    addr.oh_up / addr.ohc_up (ops/sweep.py AddrBatch).
    With `axis_name`, the row-reductions run over a device-sharded
    reduction axis and are psum'd (gene-sharded P sampler)."""
    B = addr.r1.shape[0]
    from ..ops import onehot as oh
    s_up = oh.select_cols(oh.gather_rows(phase.SQ, addr.oh_up), addr.ohc_up)
    R_up = oh.gather_rows(cache.R, addr.oh_up)  # (2B, m)
    o_up = oh.matmul(addr.ohc_up, phase.otherT)  # (2B, m)
    smu_up = jnp.sum(R_up * o_up, axis=-1)
    same_row = (addr.r1 == addr.r2).astype(jnp.float32)
    invS2r1 = oh.gather_rows(invS2, addr.oh_up[:B])
    x = jnp.sum(o_up[:B] * o_up[B:] * invS2r1, axis=-1)
    smu1 = smu_up[:B]
    smu2 = smu_up[B:]
    if axis_name is not None:
        smu1, smu2, x = jax.lax.psum((smu1, smu2, x), axis_name)
    s1 = s_up[:B]
    s2 = s_up[B:]
    return AlphaBatch(
        s1=s1,
        smu1=smu1,
        s_pair=s1 + s2 - 2.0 * x * same_row,
        smu_pair=smu1 - smu2,
    )


def apply_updates(cache: DenseCache, phase: DensePhase, invS2: jnp.ndarray,
                  upd) -> DenseCache:
    """R[r, :] -= delta * other[:, c] * invS2[r, :] for each applied matrix
    change — the one-hot matmul form of updateAPMatrix (reference:
    DenseNormalModel.cpp:243-258). `upd.deltas` are the *actual*
    (clamp-adjusted) deltas, matching safelyChangeMatrix (cpp:117-123);
    masked lanes carry zero one-hot rows and zero deltas."""
    from ..ops import onehot as oh
    o = oh.matmul(upd.ohc, phase.otherT)  # (2B, m)
    invS2r = oh.gather_rows(invS2, upd.oh_rows)
    contrib = upd.deltas[:, None] * o * invS2r
    return DenseCache(R=cache.R - oh.matmul(upd.oh_rows.T, contrib))


class DenseModel(NamedTuple):
    """Trace-time adapter handed to the generic sweep (ops/sweep.py):
    closes over the per-update-phase constants (frozen partner factor
    tables + uncertainty); the mutable mstate is the DenseCache residual."""

    col_nz: jnp.ndarray  # (k,) float32 in {0, 1}
    alpha: object  # fn(mstate, M, addr: AddrBatch) -> AlphaBatch
    apply: object  # fn(mstate, upd: ApplyBatch) -> mstate


def make_model(phase: DensePhase, invS2: jnp.ndarray,
               axis_name=None) -> DenseModel:
    def alpha(mstate: DenseCache, M, addr):
        del M  # the dense model reads the residual cache, not M
        return alpha_batch(mstate, phase, invS2, addr, axis_name=axis_name)

    def apply(mstate: DenseCache, upd):
        return apply_updates(mstate, phase, invS2, upd)

    return DenseModel(col_nz=phase.col_nz.astype(jnp.float32),
                      alpha=alpha, apply=apply)


def chisq(cache: DenseCache, invS2: jnp.ndarray) -> jnp.ndarray:
    """chi^2 = sum ((D-AP)/S)^2 = sum R^2 / invS2 (reference:
    DenseNormalModel.cpp:56-68)."""
    return jnp.sum(jnp.where(invS2 > 0, cache.R * cache.R / invS2, 0.0))
