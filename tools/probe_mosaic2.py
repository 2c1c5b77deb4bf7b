"""Round-4 probe 2: marginal in-kernel op costs via repetition loops.

Each kernel runs its op sequence R times inside a fori_loop with a
data dependence so the compiler cannot elide iterations. Marginal cost
per rep = (t(R2) - t(R1)) / (R2 - R1), which cancels launch overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
PREC = jax.lax.Precision.HIGHEST
R1, R2 = 4, 36


def timed(f, *args, reps=30):
    out = f(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def marginal(make_kernel, out_shape, *args, vmem=100 * 1024 * 1024):
    ts = []
    for R in (R1, R2):
        f = jax.jit(lambda *a, R=R: pl.pallas_call(
            make_kernel(R), out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem))(*a))
        ts.append(timed(f, *args))
    return (ts[1] - ts[0]) / (R2 - R1)


def probe(name, fn):
    try:
        print(f"{name}: {fn()}")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def main():
    print("backend:", jax.default_backend())

    # batched pg-gather style dot: (NCH,T,k) .1@1. (NCH,T,B) -> (NCH,k,B)
    def bdot_case(NCH, T, K, B, prec=PREC):
        def make(R):
            def k(a_ref, b_ref, o_ref):
                def body(i, acc):
                    b = b_ref[:] + acc[:, :1, :1] * 0.0
                    return acc + jax.lax.dot_general(
                        a_ref[:], b, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=F32, precision=prec)
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, K, B), F32))
            return k

        a = jnp.ones((NCH, T, K), F32)
        b = jnp.ones((NCH, T, B), F32)
        t = marginal(make, jax.ShapeDtypeStruct((NCH, K, B), F32), a, b)
        return f"{t*1e6:.2f}us/op"

    probe("bdot 8x(1363,7)x(1363,256) HIGHEST", lambda: bdot_case(8, 1363, 7, 256))
    probe("bdot 8x(1363,7)x(1363,512) HIGHEST", lambda: bdot_case(8, 1363, 7, 512))
    probe("bdot 8x(1363,7)x(1363,1024) HIGHEST", lambda: bdot_case(8, 1363, 7, 1024))
    probe("bdot 1x(1363,7)x(1363,256) HIGHEST", lambda: bdot_case(1, 1363, 7, 256))
    probe("bdot 8x(1363,9)x(1363,512) HIGHEST", lambda: bdot_case(8, 1363, 9, 512))
    probe("bdot 8x(1363,9)x(1363,512) DEFAULT",
          lambda: bdot_case(8, 1363, 9, 512, prec=jax.lax.Precision.DEFAULT))
    probe("bdot 8x(128,128)x(128,512) HIGHEST (atom tbl)",
          lambda: bdot_case(8, 128, 128, 512))

    # tri prefix: (NCH,B) @ (B,B)
    def tri_case(NCH, B):
        def make(R):
            def k(x_ref, o_ref):
                tri = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                       <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                       ).astype(F32)

                def body(i, acc):
                    x = x_ref[:] + acc[:, :1] * 0.0
                    return acc + jnp.dot(x, tri,
                                         preferred_element_type=F32,
                                         precision=PREC)
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        x = jnp.ones((NCH, B), F32)
        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), x)
        return f"{t*1e6:.2f}us/op"

    probe("tri (8,512)@(512,512) HIGHEST", lambda: tri_case(8, 512))
    probe("tri (8,1024)@(1024,1024) HIGHEST", lambda: tri_case(8, 1024))

    # match-matrix conflict: transpose via eye + (B,B) compare + reduce,
    # batched over NCH via 3D
    def match_case(NCH, B):
        def make(R):
            def k(r_ref, o_ref):
                eye = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                       ).astype(F32)
                tri_s = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                         < jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                         ).astype(F32)

                def body(i, acc):
                    r = r_ref[:] + acc * 0.0  # (NCH, B)
                    rcol = jax.lax.dot_general(
                        r, eye, (((1,), (1,)), ((), ())),
                        preferred_element_type=F32, precision=PREC)
                    # rcol (NCH, B) ... need (NCH,B,B) compare:
                    m = (rcol[:, :, None] == r[:, None, :]).astype(F32)
                    cnt = jnp.sum(m * tri_s[None], axis=1)
                    return acc + (cnt == 0.0).astype(F32)
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        r = (jnp.arange(NCH * B, dtype=F32).reshape(NCH, B) % 113.0)
        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), r)
        return f"{t*1e6:.2f}us/op"

    probe("match-mat (8,512,512)", lambda: match_case(8, 512))
    probe("match-mat (8,1024,1024)", lambda: match_case(8, 1024))

    # elementwise chain marginal on (8,B)
    def elem_case(NCH, B, n_ops=50):
        def make(R):
            def k(x_ref, o_ref):
                def body(i, acc):
                    x = x_ref[:] + acc * 0.0
                    for _ in range(n_ops):
                        x = x * 1.0001 + 0.001
                    return acc + x
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        x = jnp.ones((NCH, B), F32)
        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), x)
        return f"{t*1e6:.2f}us per {n_ops} ops"

    probe("elemwise 50 ops (1,256)", lambda: elem_case(1, 256))
    probe("elemwise 50 ops (8,512)", lambda: elem_case(8, 512))
    probe("elemwise 50 ops (8,1024)", lambda: elem_case(8, 1024))

    # (NCH,NR,B) one-hot build + masked min-reduce (row-conflict old way)
    def ohmin_case(NCH, NR, B):
        def make(R):
            def k(r_ref, o_ref):
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (NCH, NR, B), 1).astype(F32)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (NCH, 1, B), 2).astype(F32)

                def body(i, acc):
                    r = r_ref[:] + acc * 0.0
                    oh = (iota == r[:, None, :])
                    lf = jnp.where(oh, lane, F32(B))
                    rmin = jnp.min(lf, axis=2)  # (NCH, NR)
                    return acc + rmin[:, :1] * 0.0 + r
                o_ref[:] = jax.lax.fori_loop(
                    0, R, body, jnp.zeros((NCH, B), F32))
            return k

        r = (jnp.arange(NCH * B, dtype=F32).reshape(NCH, B) % 113.0)
        t = marginal(make, jax.ShapeDtypeStruct((NCH, B), F32), r)
        return f"{t*1e6:.2f}us/op"

    probe("onehot+minreduce (8,1363,512)", lambda: ohmin_case(8, 1363, 512))

    # while_loop retest: carry only arrays
    def try_while():
        def k(x_ref, o_ref):
            def cond(c):
                return jnp.sum(c[0]) < 100.0

            def body(c):
                a, acc = c
                return a + 1.0, acc + x_ref[:]

            a0 = jnp.zeros((1, 128), F32)
            _, acc = jax.lax.while_loop(cond, body, (a0, a0))
            o_ref[:] = acc

        x = jnp.ones((1, 128), F32)
        f = jax.jit(lambda x: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1, 128), F32))(x))
        r = f(x)
        return f"ran, r[0,0]={float(r[0,0])} (expect 1.0 if 1 iter... )"

    probe("while_loop (array carry)", try_while)

    # PRNG retest with correct bitcast order
    def try_prng():
        def k(seed_ref, o_ref):
            pltpu.prng_seed(seed_ref[0])
            bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)),
                                 jnp.uint32)
            u = pltpu.bitcast((bits >> jnp.uint32(9))
                              | jnp.uint32(0x3F800000), jnp.float32) - 1.0
            o_ref[:] = u

        f = jax.jit(lambda s: pl.pallas_call(
            k, in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=jax.ShapeDtypeStruct((8, 128), F32))(s))
        r1 = np.asarray(f(jnp.array([42], jnp.int32)))
        r2 = np.asarray(f(jnp.array([42], jnp.int32)))
        det = bool(np.all(r1 == r2))
        return (f"det={det}, range=[{r1.min():.4f},{r1.max():.4f}], "
                f"mean={r1.mean():.4f}")

    probe("prng uniform (fixed)", try_prng)


if __name__ == "__main__":
    main()
