"""Probe 3: isolate the batched-dot-in-fori crash + honest marginals."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
PREC = jax.lax.Precision.HIGHEST


def timed(f, *args, reps=30):
    out = f(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def probe(name, fn):
    try:
        print(f"{name}: {fn()}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def run(k, out_shape, *args):
    return jax.jit(lambda *a: pl.pallas_call(
        k, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(*a))(*args)


def main():
    NCH, T, K, B = 8, 1363, 7, 256
    a = jnp.ones((NCH, T, K), F32)
    b = jnp.ones((NCH, T, B), F32)

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=F32, precision=PREC)

    # case 1: batched dot in fori, accumulate full, no weird slicing
    def k1(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + bdot(a_ref[:], b_ref[:] + acc * 1e-20)
        o_ref[:] = jax.lax.fori_loop(0, 4, body,
                                     jnp.zeros((NCH, K, B), F32))

    probe("bdot in fori (clean acc)", lambda: str(run(
        k1, jax.ShapeDtypeStruct((NCH, K, B), F32), a, b).shape))

    # case 2: batched dot in fori, acc not fed back into operand
    def k2(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + bdot(a_ref[:], b_ref[:]) * (1.0 + i.astype(F32))
        o_ref[:] = jax.lax.fori_loop(0, 4, body,
                                     jnp.zeros((NCH, K, B), F32))

    probe("bdot in fori (i-scaled)", lambda: str(run(
        k2, jax.ShapeDtypeStruct((NCH, K, B), F32), a, b).shape))

    # case 3: the exact probe-2 pattern (3D slice of acc)
    def k3(a_ref, b_ref, o_ref):
        def body(i, acc):
            bb = b_ref[:] + acc[:, :1, :1] * 0.0
            return acc + bdot(a_ref[:], bb)
        o_ref[:] = jax.lax.fori_loop(0, 4, body,
                                     jnp.zeros((NCH, K, B), F32))

    probe("bdot in fori (3D-slice acc)", lambda: str(run(
        k3, jax.ShapeDtypeStruct((NCH, K, B), F32), a, b).shape))

    # honest marginal helper: perturb INPUT lanes with iota*i (cheap, not
    # elidable), accumulate result
    def marginal(make, out_shape, *args):
        ts = []
        for R in (4, 36):
            f = jax.jit(lambda *ar, R=R: pl.pallas_call(
                make(R), out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024))(*ar))
            ts.append(timed(f, *args))
        return (ts[1] - ts[0]) / 32

    # honest batched-dot marginal (if compile works)
    def bdot_marg(NCH, T, K, B, prec=PREC):
        aa = jnp.ones((NCH, T, K), F32)
        bb = jnp.ones((NCH, T, B), F32)

        def make(R):
            def k(a_ref, b_ref, o_ref):
                def body(i, acc):
                    bb2 = b_ref[:] + acc * 1e-20
                    return acc + jax.lax.dot_general(
                        a_ref[:], bb2, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=F32, precision=prec)
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, K, B), F32))
            return k

        t = marginal(make, jax.ShapeDtypeStruct((NCH, K, B), F32), aa, bb)
        return f"{t*1e6:.2f}us/op"

    probe("MARG bdot 8x(1363,7)x(.,256)", lambda: bdot_marg(8, 1363, 7, 256))
    probe("MARG bdot 8x(1363,7)x(.,512)", lambda: bdot_marg(8, 1363, 7, 512))
    probe("MARG bdot 8x(1363,9)x(.,512)", lambda: bdot_marg(8, 1363, 9, 512))
    probe("MARG bdot 1x(1363,7)x(.,256)", lambda: bdot_marg(1, 1363, 7, 256))
    probe("MARG bdot 8x(128,128)x(.,512)", lambda: bdot_marg(8, 128, 128, 512))
    probe("MARG bdot 8x(75,128)x(.,512)", lambda: bdot_marg(8, 75, 128, 512))

    # honest elementwise marginal
    def elem_marg(NCH, B, n_ops=50):
        x0 = jnp.ones((NCH, B), F32)

        def make(R):
            def k(x_ref, o_ref):
                def body(i, acc):
                    x = x_ref[:] + acc * 1e-20
                    for _ in range(n_ops):
                        x = x * 1.0001 + 0.001
                    return acc + x
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), x0)
        return f"{t*1e6:.2f}us per {n_ops}"

    probe("MARG elemwise 50 (1,256)", lambda: elem_marg(1, 256))
    probe("MARG elemwise 50 (8,512)", lambda: elem_marg(8, 512))
    probe("MARG elemwise 50 (8,1024)", lambda: elem_marg(8, 1024))

    # honest onehot+minreduce marginal
    def ohmin_marg(NCH, NR, B):
        r0 = (jnp.arange(NCH * B, dtype=F32).reshape(NCH, B) % 113.0)

        def make(R):
            def k(r_ref, o_ref):
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (NCH, NR, B), 1).astype(F32)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (NCH, 1, B), 2).astype(F32)

                def body(i, acc):
                    r = r_ref[:] + acc * 1e-20
                    oh = (iota == r[:, None, :])
                    lf = jnp.where(oh, lane, F32(B))
                    rmin = jnp.min(lf, axis=1)  # (NCH, B) min over rows
                    return acc + rmin
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), r0)
        return f"{t*1e6:.2f}us/op"

    probe("MARG onehot-minred (8,1363,512)", lambda: ohmin_marg(8, 1363, 512))
    probe("MARG onehot-minred (8,1363,256)", lambda: ohmin_marg(8, 1363, 256))

    # match-mat honest
    def match_marg(NCH, B):
        r0 = (jnp.arange(NCH * B, dtype=F32).reshape(NCH, B) % 113.0)

        def make(R):
            def k(r_ref, o_ref):
                eye = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                       ).astype(F32)
                tri_s = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                         < jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                         ).astype(F32)

                def body(i, acc):
                    r = r_ref[:] + acc * 1e-20
                    rcol = jax.lax.dot_general(
                        r, eye, (((1,), (1,)), ((), ())),
                        preferred_element_type=F32, precision=PREC)
                    m = (rcol[:, :, None] == r[:, None, :]).astype(F32)
                    cnt = jnp.sum(m * tri_s[None], axis=1)
                    return acc + (cnt == 0.0).astype(F32)
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), r0)
        return f"{t*1e6:.2f}us/op"

    probe("MARG match-mat (8,512)", lambda: match_marg(8, 512))
    probe("MARG match-mat (8,1024)", lambda: match_marg(8, 1024))


if __name__ == "__main__":
    main()
