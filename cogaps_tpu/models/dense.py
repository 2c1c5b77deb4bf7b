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
                r1, c1, r2, c2, axis_name=None) -> AlphaBatch:
    """Batched alphaParameters for B proposals (single + pair forms).
    With `axis_name`, the row-reductions run over a device-sharded
    reduction axis and are psum'd (gene-sharded P sampler)."""
    s1 = phase.SQ[r1, c1]
    s2 = phase.SQ[r2, c2]
    Rr1 = cache.R[r1]  # (B, m)
    Rr2 = cache.R[r2]
    o1 = phase.otherT[c1]  # (B, m)
    o2 = phase.otherT[c2]
    smu1 = jnp.sum(Rr1 * o1, axis=-1)
    smu2 = jnp.sum(Rr2 * o2, axis=-1)
    same_row = (r1 == r2).astype(jnp.float32)
    x = jnp.sum(o1 * o2 * invS2[r1], axis=-1)
    if axis_name is not None:
        smu1, smu2, x = jax.lax.psum((smu1, smu2, x), axis_name)
    return AlphaBatch(
        s1=s1,
        smu1=smu1,
        s_pair=s1 + s2 - 2.0 * x * same_row,
        smu_pair=smu1 - smu2,
    )


def apply_updates(cache: DenseCache, phase: DensePhase, invS2: jnp.ndarray,
                  rows, cols, deltas) -> DenseCache:
    """R[r, :] -= delta * other[:, c] * invS2[r, :] for each applied matrix
    change — the scatter form of updateAPMatrix (reference:
    DenseNormalModel.cpp:243-258). `rows` may contain out-of-bounds
    sentinels for masked lanes (dropped); `deltas` are the *actual*
    (clamp-adjusted) deltas, matching safelyChangeMatrix (cpp:117-123)."""
    n_rows = cache.R.shape[0]
    rows_g = jnp.minimum(rows, n_rows - 1)
    contrib = deltas[:, None] * phase.otherT[cols] * invS2[rows_g]
    return DenseCache(R=cache.R.at[rows].add(-contrib, mode="drop"))


class DenseModel(NamedTuple):
    """Trace-time adapter handed to the generic sweep (ops/sweep.py):
    closes over the per-update-phase constants (frozen partner factor
    tables + uncertainty); the mutable mstate is the DenseCache residual."""

    col_nz: jnp.ndarray
    alpha: object  # fn(mstate, M, r1, c1, r2, c2) -> AlphaBatch
    apply: object  # fn(mstate, rows, cols, deltas) -> mstate


def make_model(phase: DensePhase, invS2: jnp.ndarray,
               axis_name=None) -> DenseModel:
    def alpha(mstate: DenseCache, M, r1, c1, r2, c2):
        del M  # the dense model reads the residual cache, not M
        return alpha_batch(mstate, phase, invS2, r1, c1, r2, c2,
                           axis_name=axis_name)

    def apply(mstate: DenseCache, rows, cols, deltas):
        return apply_updates(mstate, phase, invS2, rows, cols, deltas)

    return DenseModel(col_nz=phase.col_nz, alpha=alpha, apply=apply)


def chisq(cache: DenseCache, invS2: jnp.ndarray) -> jnp.ndarray:
    """chi^2 = sum ((D-AP)/S)^2 = sum R^2 / invS2 (reference:
    DenseNormalModel.cpp:56-68)."""
    return jnp.sum(jnp.where(invS2 > 0, cache.R * cache.R / invS2, 0.0))
