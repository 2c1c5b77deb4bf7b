"""Round-4 capability probe: which Mosaic constructs does this backend
support, and how do batched matmuls schedule vs python-unrolled ones?

Run on the real TPU:  python tools/probe_mosaic.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
PREC = jax.lax.Precision.HIGHEST


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(out)  # compile + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK]   {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def main():
    print("backend:", jax.default_backend(), jax.devices())

    # 1. batched dot_general inside a kernel
    def k_batched(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=F32, precision=PREC)

    def try_batched():
        NCH, T, B = 8, 1363, 256
        a = jnp.ones((NCH, T, 7), F32)
        b = jnp.ones((NCH, T, B), F32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            k_batched,
            out_shape=jax.ShapeDtypeStruct((NCH, 7, B), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(a, b))
        t = timed(f, a, b)
        return f"ran, {t*1e6:.1f}us"

    probe("batched dot_general (NCH,T,k)x(NCH,T,B)", try_batched)

    # 1b. unrolled comparison
    def k_unroll(a_ref, b_ref, o_ref):
        for ch in range(8):
            o_ref[ch] = jax.lax.dot_general(
                a_ref[ch], b_ref[ch], (((0,), (0,)), ((), ())),
                preferred_element_type=F32, precision=PREC)

    def try_unroll():
        NCH, T, B = 8, 1363, 256
        a = jnp.ones((NCH, T, 7), F32)
        b = jnp.ones((NCH, T, B), F32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            k_unroll,
            out_shape=jax.ShapeDtypeStruct((NCH, 7, B), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(a, b))
        t = timed(f, a, b)
        return f"ran, {t*1e6:.1f}us"

    probe("unrolled per-chain dot_general x8", try_unroll)

    # 1c. single-chain baseline
    def k_one(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=F32, precision=PREC)

    def try_one():
        T, B = 1363, 256
        a = jnp.ones((T, 7), F32)
        b = jnp.ones((T, B), F32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            k_one,
            out_shape=jax.ShapeDtypeStruct((7, B), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(a, b))
        t = timed(f, a, b)
        return f"ran, {t*1e6:.1f}us"

    probe("single dot_general (T,k)x(T,B)", try_one)

    # 2. lax.while_loop with data-dependent trip count in-kernel
    def k_while(x_ref, o_ref):
        def cond(c):
            return c[0] < x_ref[0, 0]

        def body(c):
            i, acc = c
            return i + 1.0, acc + jnp.sum(x_ref[:])

        _, acc = jax.lax.while_loop(cond, body, (F32(0.0), F32(0.0)))
        o_ref[0, 0] = acc

    def try_while():
        x = jnp.full((8, 128), 3.0, F32)
        f = jax.jit(lambda x: pl.pallas_call(
            k_while,
            out_shape=jax.ShapeDtypeStruct((1, 1), F32))(x))
        r = f(x)
        return f"ran, result={float(r[0,0])} (expect 9216)"

    probe("in-kernel lax.while_loop (dynamic trip)", try_while)

    # 3. 3D elementwise + reduce over middle axis
    def k_red(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.sum(x * x, axis=1)

    def try_red():
        x = jnp.ones((8, 128, 256), F32) * 2.0
        f = jax.jit(lambda x: pl.pallas_call(
            k_red,
            out_shape=jax.ShapeDtypeStruct((8, 256), F32))(x))
        r = f(x)
        return f"ran, r[0,0]={float(r[0,0])} (expect 512)"

    probe("3D reduce over middle axis", try_red)

    # 3b. 3D min-reduce over minor axis
    def k_min(x_ref, o_ref):
        o_ref[:] = jnp.min(x_ref[:], axis=2)

    def try_min():
        x = jnp.ones((8, 128, 256), F32) * 5.0
        f = jax.jit(lambda x: pl.pallas_call(
            k_min,
            out_shape=jax.ShapeDtypeStruct((8, 128), F32))(x))
        r = f(x)
        return f"ran, r[0,0]={float(r[0,0])}"

    probe("3D min-reduce over minor axis", try_min)

    # 4. in-kernel PRNG
    def k_prng(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits((8, 128))
        # uniform in [0,1): standard bit trick
        u = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                          jnp.float32) - 1.0
        o_ref[:] = u

    def try_prng():
        f = jax.jit(lambda s: pl.pallas_call(
            k_prng,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=jax.ShapeDtypeStruct((8, 128), F32))(s))
        r1 = np.asarray(f(jnp.array([42], jnp.int32)))
        r2 = np.asarray(f(jnp.array([42], jnp.int32)))
        r3 = np.asarray(f(jnp.array([43], jnp.int32)))
        det = bool(np.all(r1 == r2))
        diff = bool(np.any(r1 != r3))
        return (f"ran, det={det}, seeds differ={diff}, "
                f"range=[{r1.min():.3f},{r1.max():.3f}]")

    probe("pltpu.prng_random_bits + bitcast uniform", try_prng)

    # 5. (NCH,B) elementwise vs (1,B): cost of widening sublanes
    def k_elem(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(50):
            x = x * 1.0001 + 0.001
        o_ref[:] = x

    for shape in [(1, 256), (8, 256), (8, 1024)]:
        def try_elem(shape=shape):
            x = jnp.ones(shape, F32)
            f = jax.jit(lambda x: pl.pallas_call(
                k_elem,
                out_shape=jax.ShapeDtypeStruct(shape, F32))(x))
            t = timed(f, x, reps=50)
            return f"{t*1e6:.1f}us"

        probe(f"50 chained elementwise ops on {shape}", try_elem)

    # 6. (B,B) match-matrix conflict formulation cost
    def k_match(r_ref, o_ref):
        B = r_ref.shape[1]
        r = r_ref[:]  # (1, B)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(F32)
        rcol = jax.lax.dot_general(eye, r, (((1,), (1,)), ((), ())),
                                   preferred_element_type=F32,
                                   precision=PREC)  # (B, 1)
        match = (rcol == r).astype(F32)
        tri_s = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                 < jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(F32)
        cnt = jnp.sum(match * tri_s, axis=0, keepdims=True)  # (1, B)
        o_ref[:] = (cnt == 0.0).astype(F32)

    def try_match():
        B = 1024
        r = jnp.arange(B, dtype=F32).reshape(1, B) % 113.0
        f = jax.jit(lambda r: pl.pallas_call(
            k_match,
            out_shape=jax.ShapeDtypeStruct((1, B), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(r))
        t = timed(f, r)
        r0 = f(r)
        return f"ran, {t*1e6:.1f}us, kept={float(jnp.sum(r0))}/1024"

    probe("(B,B) match-matrix first-wins B=1024", try_match)


if __name__ == "__main__":
    main()
