"""Probe: in-kernel table rebuilds via per-rh-block matmuls.

Checks the contraction patterns the merged iteration kernel needs:
 1. AP block: dot_general(M2a_blk (128,k), M2p (128,k), contract k,k)
    -> (128,128)
 2. Y block: dot_general(R (128,128), M2p (128,k), contract lane
    vs sublane) -> (128,k)
 3. per-rh transpose: dot_general(M2a_blk (128,k) contract sublane with
    eye) -> (k,128)
 4. Z_p build: T_c = invS2p_blk * rowvec; dot -> (128, k)
All verified for exactness against numpy.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def main():
    k, m, RH = 7, 9, 3
    G = RH * 128
    rng = np.random.default_rng(0)
    M_a = rng.gamma(2.0, 1.0, (G, k)).astype(np.float32)
    M_p = np.zeros((128, k), np.float32)
    M_p[:m] = rng.gamma(2.0, 1.0, (m, k)).astype(np.float32)
    D = np.zeros((G, 128), np.float32)
    D[:, :m] = rng.gamma(2.0, 2.0, (G, m))
    inv = np.zeros((G, 128), np.float32)
    inv[:, :m] = 1.0 / np.maximum(0.1 * D[:, :m], 0.1) ** 2

    # slab-major forms
    def to_slab(X):
        w = X.shape[1]
        return X.reshape(RH, 128, w).transpose(1, 0, 2).reshape(
            128, RH * w)

    M2a = to_slab(M_a)          # (128, RH*k)
    D2 = to_slab(D)             # (128, RH*128)
    inv2 = to_slab(inv)

    def kern(M2a_ref, M2p_ref, D2_ref, inv2_ref, Y_ref, SQ_ref, Zp_ref):
        M2a_ = M2a_ref[:]
        M2p_ = M2p_ref[:]
        Ybs, SQbs = [], []
        Zp = jnp.zeros((128, k * k), F32)
        Mp2 = M2p_ * M2p_
        eye = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
               ).astype(F32)
        for rh in range(RH):
            blk = M2a_[:, rh * k:(rh + 1) * k]
            Db = D2_ref[:, rh * 128:(rh + 1) * 128]
            ib = inv2_ref[:, rh * 128:(rh + 1) * 128]
            # AP[r_lo, s] = sum_c blk[r,c] M2p[s,c]
            AP = jax.lax.dot_general(blk, M2p_, (((1,), (1,)), ((), ())),
                                     preferred_element_type=F32,
                                     precision=HI)  # (128, 128)
            R = (Db - AP) * ib
            # Y_blk[r, c] = sum_s R[r,s] M2p[s,c]  (contract lane of R
            # with sublane of M2p)
            Yb = jax.lax.dot_general(R, M2p_, (((1,), (0,)), ((), ())),
                                     preferred_element_type=F32,
                                     precision=HI)  # (128, k)
            SQb = jax.lax.dot_general(ib, Mp2, (((1,), (0,)), ((), ())),
                                      preferred_element_type=F32,
                                      precision=HI)
            Ybs.append(Yb)
            SQbs.append(SQb)
            # P-side Z contribution from this gene block:
            # Z_p[s, c*k+c'] += sum_jlo inv_p[s, j] Ma[j,c] Ma[j,c']
            # inv_p block = transpose of ib (gene-lo as lanes)
            ibT = jax.lax.dot_general(ib, eye, (((0,), (0,)), ((), ())),
                                      preferred_element_type=F32,
                                      precision=HI)  # (128s?, ...)
            # ibT[s, j_lo]: actually ib is (128 gene-lo, 128 s);
            # transpose -> (128 s, 128 gene-lo)
            blkT = jax.lax.dot_general(blk, eye, (((0,), (0,)), ((), ())),
                                       preferred_element_type=F32,
                                       precision=HI)  # (k, 128 gene-lo)
            Zcs = []
            for c in range(k):
                Tc = ibT * blkT[c:c + 1, :]  # (128 s, 128 j)
                Zc = jax.lax.dot_general(
                    Tc, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=F32, precision=HI)  # (128s,k)
                Zcs.append(Zc)
            Zp = Zp + jnp.concatenate(Zcs, axis=1)
        Y_ref[:] = jnp.concatenate(Ybs, axis=1)
        SQ_ref[:] = jnp.concatenate(SQbs, axis=1)
        Zp_ref[:] = Zp

    out = jax.jit(lambda a, b, c, d: pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128, RH * k), F32),
                   jax.ShapeDtypeStruct((128, RH * k), F32),
                   jax.ShapeDtypeStruct((128, k * k), F32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))(a, b, c, d))(
        jnp.asarray(M2a), jnp.asarray(M_p), jnp.asarray(D2),
        jnp.asarray(inv2))
    Y2, SQ2, Zp = map(np.asarray, out)

    # numpy reference
    AP_ref = M_a @ M_p[:m].T  # (G, m)
    R_ref = (D[:, :m] - AP_ref) * inv[:, :m]
    Y_ref = R_ref @ M_p[:m]
    SQ_ref = inv[:, :m] @ (M_p[:m] ** 2)
    inv_p = inv[:, :m].T  # (m, G)
    Zp_ref = np.einsum("sj,jc,jd->scd", inv_p, M_a, M_a).reshape(m, -1)

    def back(X2, w):
        return X2.reshape(128, RH, w).transpose(1, 0, 2).reshape(G, w)

    def relerr(a, b):
        return np.abs(a - b).max() / max(np.abs(b).max(), 1.0)

    e1 = relerr(back(Y2, k), Y_ref)
    e2 = relerr(back(SQ2, k), SQ_ref)
    e3 = relerr(Zp[:m], Zp_ref)
    print(f"Y relerr {e1:.3e}  SQ relerr {e2:.3e}  Zp relerr {e3:.3e}")
    assert e1 < 1e-5 and e2 < 1e-5 and e3 < 1e-5
    print("REBUILD PATTERNS OK")


if __name__ == "__main__":
    main()
