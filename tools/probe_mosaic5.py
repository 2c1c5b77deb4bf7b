"""Probe 5: correctness of the primitives the new fused kernel rests on.

1. (NCH,B)->(NCH,B,B) sublane broadcast compare (match-matrix conflicts)
2. bf16 batched dot_general with f32 accumulation (3-split transport)
3. exact f32 transport via 3-way bf16 split gather
4. (NCH,T,B) one-hot * (NCH,B) vals -> batched scatter sums
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16


def probe(name, fn):
    try:
        print(f"{name}: {fn()}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def call(k, out_shape, *args, **kw):
    return jax.jit(lambda *a: pl.pallas_call(
        k, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024), **kw)(*a))(*args)


def main():
    NCH, B = 4, 256
    rng = np.random.default_rng(0)

    # 1. match-matrix: earlier-lane same-value count
    r_np = rng.integers(0, 57, (NCH, B)).astype(np.float32)

    def k_match(r_ref, o_ref):
        r = r_ref[:]
        m = (r[:, :, None] == r[:, None, :]).astype(F32)  # [ch, j, i]
        tri_s = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                 < jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                 ).astype(F32)
        o_ref[:] = jnp.sum(m * tri_s[None], axis=1)

    def try_match():
        out = np.asarray(call(k_match,
                              jax.ShapeDtypeStruct((NCH, B), F32),
                              jnp.asarray(r_np)))
        # reference
        exp = np.zeros((NCH, B), np.float32)
        for ch in range(NCH):
            for i in range(B):
                exp[ch, i] = np.sum(r_np[ch, :i] == r_np[ch, i])
        ok = np.array_equal(out, exp)
        return f"exact={ok}"

    probe("match-matrix earlier-count", try_match)

    # 2+3. exact gather via 3-way bf16 split batched dot
    T = 1363
    tbl_np = (rng.standard_normal((NCH, T, 16)) * 100).astype(np.float32)
    idx_np = rng.integers(0, T, (NCH, B)).astype(np.float32)

    def k_gather(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]  # (NCH, T, 16)
        idx = idx_ref[:]  # (NCH, B)
        iota = jax.lax.broadcasted_iota(jnp.int32, (NCH, T, B), 1
                                        ).astype(F32)
        oh = (iota == idx[:, None, :]).astype(BF16)
        h = tbl.astype(BF16)
        r1 = tbl - h.astype(F32)
        m = r1.astype(BF16)
        lo = (r1 - m.astype(F32)).astype(BF16)
        acc = jnp.zeros((NCH, 16, B), F32)
        for part in (h, m, lo):
            acc = acc + jax.lax.dot_general(
                part, oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=F32)
        o_ref[:] = acc

    def try_gather():
        out = np.asarray(call(
            k_gather, jax.ShapeDtypeStruct((NCH, 16, B), F32),
            jnp.asarray(tbl_np), jnp.asarray(idx_np)))
        exp = np.stack([tbl_np[ch, idx_np[ch].astype(int), :].T
                        for ch in range(NCH)])
        ok = np.array_equal(out, exp)
        mx = np.abs(out - exp).max()
        return f"exact={ok} maxerr={mx}"

    probe("3-split bf16 batched gather", try_gather)

    # 4. batched scatter sums: out[ch,t,l] = sum_i oh[ch,t,i]*vals..., via
    # bf16 split of vals, one-hot hi/lo
    C = 1024
    vals_np = (rng.standard_normal((NCH, B)) * 37).astype(np.float32)
    slot_np = rng.integers(0, C, (NCH, B)).astype(np.float32)
    # make slots unique per chain (conflict-free writes)
    for ch in range(NCH):
        slot_np[ch] = rng.permutation(C)[:B].astype(np.float32)

    def k_scatter(v_ref, s_ref, o_ref):
        v = v_ref[:]
        s = s_ref[:]
        hi = jnp.floor(s / 128.0)
        lo = s - hi * 128.0
        Tc = C // 128
        ih = jax.lax.broadcasted_iota(jnp.int32, (NCH, Tc, B), 1
                                      ).astype(F32)
        il = jax.lax.broadcasted_iota(jnp.int32, (NCH, 128, B), 1
                                      ).astype(F32)
        ohh = (ih == hi[:, None, :]).astype(BF16)
        ohl = (il == lo[:, None, :]).astype(BF16)
        h = v.astype(BF16)
        r1 = v - h.astype(F32)
        m = r1.astype(BF16)
        lo2 = (r1 - m.astype(F32)).astype(BF16)
        acc = jnp.zeros((NCH, Tc, 128), F32)
        for part in (h, m, lo2):
            acc = acc + jax.lax.dot_general(
                ohh * part[:, None, :], ohl,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=F32)
        o_ref[:] = acc

    def try_scatter():
        out = np.asarray(call(
            k_scatter, jax.ShapeDtypeStruct((NCH, C // 128, 128), F32),
            jnp.asarray(vals_np), jnp.asarray(slot_np))).reshape(NCH, C)
        exp = np.zeros((NCH, C), np.float32)
        for ch in range(NCH):
            exp[ch, slot_np[ch].astype(int)] = vals_np[ch]
        ok = np.array_equal(out, exp)
        return f"exact={ok} maxerr={np.abs(out-exp).max()}"

    probe("3-split bf16 batched scatter", try_scatter)

    # 5. gather reduce form: W (NCH,128,B) * ohl -> sum axis=1
    def k_gred(tbl_ref, idx_ref, o_ref):
        t2 = tbl_ref[:]  # (NCH, Tc, 128) flat table
        idx = idx_ref[:]
        Tc = C // 128
        hi = jnp.floor(idx / 128.0)
        lo = idx - hi * 128.0
        ih = jax.lax.broadcasted_iota(jnp.int32, (NCH, Tc, B), 1
                                      ).astype(F32)
        il = jax.lax.broadcasted_iota(jnp.int32, (NCH, 128, B), 1
                                      ).astype(F32)
        ohh = (ih == hi[:, None, :]).astype(BF16)
        ohl = (il == lo[:, None, :]).astype(F32)
        h = t2.astype(BF16)
        r1 = t2 - h.astype(F32)
        m = r1.astype(BF16)
        lo2 = (r1 - m.astype(F32)).astype(BF16)
        W = jnp.zeros((NCH, 128, B), F32)
        for part in (h, m, lo2):
            W = W + jax.lax.dot_general(
                part, ohh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=F32)
        o_ref[:] = jnp.sum(W * ohl, axis=1)

    def try_gred():
        t2_np = (rng.standard_normal((NCH, C // 128, 128)) * 11
                 ).astype(np.float32)
        out = np.asarray(call(
            k_gred, jax.ShapeDtypeStruct((NCH, B), F32),
            jnp.asarray(t2_np), jnp.asarray(slot_np)))
        flat = t2_np.reshape(NCH, C)
        exp = np.stack([flat[ch, slot_np[ch].astype(int)]
                        for ch in range(NCH)])
        ok = np.array_equal(out, exp)
        return f"exact={ok} maxerr={np.abs(out-exp).max()}"

    probe("flat-table 2-level batched gather", try_gred)


if __name__ == "__main__":
    main()
