"""Microbenchmark of candidate hot-path primitives on the current backend.

Times each op pattern inside a chained lax.fori_loop (so results reflect
in-program cost, not dispatch), at a configurable leading chain dim.
This is the evidence base for ops/onehot.py's design choices.

Usage: python tools/perf_primitives.py [n_chains]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N_LOOP = 200


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_LOOP
    print(f"{name:55s} {dt*1e6:9.2f} us/iter", flush=True)
    return dt


def chain(body):
    """Run body N_LOOP times sequentially, data-dependent."""
    def run(*args):
        return jax.lax.fori_loop(0, N_LOOP, body, args)
    return run


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 16  # chains
    key = jax.random.PRNGKey(0)
    CAP = 65536
    B = 1024
    table = jax.random.uniform(key, (C, CAP))
    idx = jax.random.randint(key, (C, B), 0, CAP)
    R = jax.random.uniform(key, (C, 1363, 9))
    rows = jax.random.randint(key, (C, B), 0, 1363)
    upd = jax.random.uniform(key, (C, B, 9))
    small = jax.random.uniform(key, (C, 9, 1363))

    print(f"chains={C} CAP={CAP} B={B}", flush=True)

    # 1. gather (C, B) from (C, CAP) table
    def g1(i, a):
        t, ix = a
        v = jnp.take_along_axis(t, (ix + i) % CAP, axis=1)
        return (t + v.sum() * 1e-12, ix)
    timeit("gather (B,) from (CAP,) table", chain(g1), table, idx)

    # 2. scatter set (B,) into (CAP,)
    def s1(i, a):
        t, ix = a
        vals = jnp.full((C, B), 1e-9, jnp.float32) * i
        t2 = jax.vmap(lambda tt, ii, vv: tt.at[ii].set(vv))(t, ix, vals)
        return (t2, ix)
    timeit("scatter set (B,) into (CAP,)", chain(s1), table, idx)

    # 3. scatter-add rows (B,9) into (1363,9)
    def s2(i, a):
        r, ix, u = a
        r2 = jax.vmap(lambda rr, ii, uu: rr.at[ii].add(uu * 1e-9))(
            r, ix % 1363, u)
        return (r2, ix, u)
    timeit("scatter-add (B,9) rows into (1363,9)", chain(s2), R, rows, upd)

    # 4. gather rows (B,9) from (1363,9)
    def g2(i, a):
        r, ix = a
        v = jax.vmap(lambda rr, ii: rr[ii])(r, (ix + i) % 1363)
        return (r + v.sum() * 1e-12, ix)
    timeit("gather (B,9) rows from (1363,9)", chain(g2), R, rows)

    # 5. one-hot matmul gather rows: (B,1363)@(1363,9) HIGHEST
    HI = jax.lax.Precision.HIGHEST
    def g3(i, a):
        r, ix = a
        ohm = (((ix + i) % 1363)[:, :, None]
               == jnp.arange(1363)[None, None, :]).astype(jnp.float32)
        out = jnp.einsum("cbn,cnm->cbm", ohm, r, precision=HI)
        return (r + out.sum() * 1e-12, ix)
    timeit("one-hot gather (B,1363)@(1363,9) HIGHEST", chain(g3), R, rows)

    # 5b. same at default precision
    def g3d(i, a):
        r, ix = a
        ohm = (((ix + i) % 1363)[:, :, None]
               == jnp.arange(1363)[None, None, :]).astype(jnp.float32)
        out = jnp.einsum("cbn,cnm->cbm", ohm, r)
        return (r + out.sum() * 1e-12, ix)
    timeit("one-hot gather (B,1363)@(1363,9) default", chain(g3d), R, rows)

    # 6. one-hot factorized table gather (B,) from 64k
    def g4(i, a):
        t, ix = a
        ii = (ix + i) % CAP
        hi, lo = ii // 128, ii % 128
        ohh = (hi[:, :, None] == jnp.arange(CAP // 128)[None, None, :]
               ).astype(jnp.float32)
        ohl = (lo[:, :, None] == jnp.arange(128)[None, None, :]
               ).astype(jnp.float32)
        t2 = t.reshape(C, CAP // 128, 128)
        g = jnp.einsum("cbh,chl->cbl", ohh, t2, precision=HI)
        v = jnp.sum(g * ohl, axis=-1)
        return (t + v.sum() * 1e-12, ix)
    timeit("one-hot factorized table gather (B,) from 64k", chain(g4),
           table, idx)

    # 7. flat cumsum over (CAP,)
    def c1(i, a):
        (t,) = a
        return (t + jnp.cumsum(t, axis=1) * 1e-12,)
    timeit("flat cumsum over (CAP,)", chain(c1), table)

    # 8. small elementwise mul+rowsum on (9,1363)
    def e1(i, a):
        (s,) = a
        return (s + jnp.sum(s * s, axis=2, keepdims=True) * 1e-12,)
    timeit("elementwise mul+rowsum (9,1363)", chain(e1), small)

    # 9. one-hot scatter-add matmul (1363,B)@(B,9)
    def s3(i, a):
        r, ix, u = a
        ohm = ((ix % 1363)[:, :, None]
               == jnp.arange(1363)[None, None, :]).astype(jnp.float32)
        out = jnp.einsum("cbn,cbm->cnm", ohm, u, precision=HI)
        return (r + out * 1e-12, ix, u)
    timeit("one-hot scatter-add (1363,B)@(B,9) HIGHEST", chain(s3),
           R, rows, upd)

    # 10. cumsum + searchsorted (B,) in (CAP,)
    def ss(i, a):
        t, ix = a
        cum = jnp.cumsum((t > 0.5).astype(jnp.int32), axis=1)
        s = jax.vmap(lambda cc, ii: jnp.searchsorted(cc, ii + 1))(
            cum, (ix + i) % (CAP // 2))
        return (t + s.sum() * 1e-12, ix)
    timeit("cumsum + searchsorted (B,) in (CAP,)", chain(ss), table, idx)

    # 11. threefry uniforms (C,B,5)
    def r1(i, a):
        (t,) = a
        k = jax.random.fold_in(key, i)
        u = jax.random.uniform(k, (C, B, 5))
        return (t + u.sum() * 1e-12,)
    timeit("threefry uniform (C,B,5)", chain(r1), table)

    # 12. B x B conflict + first-wins (4 eq terms)
    def cf(i, a):
        r, ix = a
        x = (ix + i) % 1363
        eq = x[:, :, None] == x[:, None, :]
        for s in range(3):
            eq = eq | (x[:, :, None] == (x + s + 1)[:, None, :])
        tri = jnp.tril(jnp.ones((B, B), jnp.bool_), -1)
        keep = ~jnp.any(eq & tri, axis=-1)
        return (r + keep.sum() * 1e-12, ix)
    timeit("BxB conflict + first-wins (4 eq terms)", chain(cf), R, rows)

    # 13. per-row prefix-count conflict: onehot cumsum over rows
    def cf2(i, a):
        r, ix = a
        x = (ix + i) % 1363
        ohm = (x[:, :, None] == jnp.arange(1363)[None, None, :]
               ).astype(jnp.float32)
        cum = jnp.cumsum(ohm, axis=1)  # (C,B,1363) prefix counts
        mine = jnp.take_along_axis(cum, x[:, :, None], axis=2)[..., 0]
        keep = mine <= 1.0
        return (r + keep.sum() * 1e-12, ix)
    timeit("conflict via onehot-cumsum (B,1363)", chain(cf2), R, rows)

    # 14. tiny gather (16,) from (4096,)
    small_t = jax.random.uniform(key, (C, 4096))
    small_i = jax.random.randint(key, (C, 16), 0, 4096)
    def g5(i, a):
        t, ix = a
        v = jnp.take_along_axis(t, (ix + i) % 4096, axis=1)
        return (t + v.sum() * 1e-12, ix)
    timeit("gather (16,) from (4096,)", chain(g5), small_t, small_i)


if __name__ == "__main__":
    main()
