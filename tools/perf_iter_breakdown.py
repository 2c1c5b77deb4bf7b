"""Per-iteration time breakdown + Poisson-budget shortfall probe.

Reconstructs the bench configuration (GIST k=7, NCH chains, batch path),
drives the engine to steady state, then (a) reports how often the single
s_max-sweep multi-chain kernel call falls short of the drawn Poisson
budget n_steps (the single-chain path wraps an outer while_loop for
exactly this; run_iteration_batch does not), and (b) times the iteration
components separately: A kernel, P kernel, cache rebuilds, RNG+stats.

Usage: python tools/perf_iter_breakdown.py [n_chains] [iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cogaps_tpu.params import CogapsParams
from cogaps_tpu.parallel.multichain import MultichainEngine, stack_device_data
from cogaps_tpu.engine import EQUILIBRATION, run_iteration_batch
from cogaps_tpu.models import dense
from cogaps_tpu.ops import rng as gaps_rng
from cogaps_tpu.ops.pallas_sweep import run_updates_pallas_multi
from cogaps_tpu.io import parsers

NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_IT = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
PROBE = 200


def fence(x):
    jax.device_get(jax.tree.leaves(x)[0])


def main():
    D, _, _ = parsers.read_matrix("data/GIST.csv")
    params = CogapsParams(n_patterns=7, n_iterations=N_IT, seed=42)
    cfg = params.engine_config(*D.shape)
    data = stack_device_data([D] * NCH, None, cfg)
    eng = MultichainEngine(data, cfg)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(NCH) + 42)

    state, stats = eng.init_state(), eng.init_stats()
    t0 = time.perf_counter()
    state, stats = eng.run_phase(state, stats, keys, EQUILIBRATION)
    fence(stats)
    t_eq = time.perf_counter() - t0
    print(f"equilibration: {t_eq:.1f}s  "
          f"({t_eq / N_IT * 1e3:.3f} ms/iter incl compile)")
    print("atoms A:", np.asarray(state.atoms_a.n),
          " P:", np.asarray(state.atoms_p.n))

    # ---- shortfall probe: n_steps drawn vs done, per sampler ----
    consts_a, consts_p = eng.consts_a, eng.consts_p
    ck_a = consts_a._replace(batch=min(consts_a.batch, cfg.pallas_max_batch))
    ck_p = consts_p._replace(batch=min(consts_p.batch, cfg.pallas_max_batch))

    @jax.jit
    def probe_step(it, state):
        key_it = jax.vmap(lambda k: jax.random.fold_in(
            jax.random.fold_in(k, EQUILIBRATION), it))(keys)
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(key_it)
        kpa, kpp, kua, kup = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
        temp = jnp.float32(1.0)
        n_a = jax.vmap(lambda k, n: gaps_rng.poisson(
            k, jnp.maximum(n, 10).astype(jnp.float32)))(kpa, state.atoms_a.n)
        n_p = jax.vmap(lambda k, n: gaps_rng.poisson(
            k, jnp.maximum(n, 10).astype(jnp.float32)))(kpp, state.atoms_p.n)
        cache_a = jax.vmap(dense.rebuild_cache)(data.D, data.invS2,
                                                state.M_a, state.M_p)
        atoms_a, M_a, _, done_a, ns_a, _ = run_updates_pallas_multi(
            kua, state.atoms_a, state.M_a, cache_a, temp, n_a, ck_a,
            data.mass_a, invS2=data.invS2, other_M=state.M_p,
            s_max=cfg.s_max)
        cache_p = jax.vmap(dense.rebuild_cache)(data.D_t, data.invS2_t,
                                                state.M_p, M_a)
        atoms_p, M_p, _, done_p, ns_p, _ = run_updates_pallas_multi(
            kup, state.atoms_p, state.M_p, cache_p, temp, n_p, ck_p,
            data.mass_p, invS2=data.invS2_t, other_M=M_a,
            s_max=cfg.s_max)
        new = state.__class__(atoms_a=atoms_a, atoms_p=atoms_p,
                              M_a=M_a, M_p=M_p)
        return new, (n_a, done_a, ns_a, n_p, done_p, ns_p)

    rec = []
    for i in range(PROBE):
        state, r = probe_step(jnp.int32(N_IT + i), state)
        rec.append(jax.device_get(r))
    n_a, d_a, s_a, n_p, d_p, s_p = (np.stack([r[j] for r in rec])
                                    for j in range(6))
    for name, n, d, s in (("A", n_a, d_a, s_a), ("P", n_p, d_p, s_p)):
        short = np.maximum(n - d, 0)
        print(f"{name}: n_steps mean {n.mean():8.1f}  done mean "
              f"{d.mean():8.1f}  sweeps mean {s.mean():5.1f}  "
              f"short-iters {(short > 0).mean() * 100:5.1f}%  "
              f"mean shortfall {short.mean():7.1f}  "
              f"max {short.max()}")

    # ---- component timing at steady state ----
    REPS = 200
    temp = jnp.float32(1.0)
    n_a_fix = jnp.maximum(state.atoms_a.n, 10)
    n_p_fix = jnp.maximum(state.atoms_p.n, 10)

    @jax.jit
    def loop_full(state):
        def body(it, c):
            st, ss = c
            return run_iteration_batch(cfg, consts_a, consts_p, eng.hist,
                                       EQUILIBRATION, data, it, st, ss,
                                       keys)
        return jax.lax.fori_loop(0, REPS, body, (state, stats))

    @jax.jit
    def loop_kernel_a(state):
        def body(it, st):
            kua = jax.vmap(lambda k: jax.random.fold_in(k, it))(keys)
            cache_a = jax.vmap(dense.rebuild_cache)(data.D, data.invS2,
                                                    st.M_a, st.M_p)
            atoms_a, M_a, _, _, _, _ = run_updates_pallas_multi(
                kua, st.atoms_a, st.M_a, cache_a, temp, n_a_fix, ck_a,
                data.mass_a, invS2=data.invS2, other_M=st.M_p,
                s_max=cfg.s_max)
            return st.__class__(atoms_a=atoms_a, atoms_p=st.atoms_p,
                                M_a=M_a, M_p=st.M_p)
        return jax.lax.fori_loop(0, REPS, body, state)

    @jax.jit
    def loop_kernel_p(state):
        def body(it, st):
            kup = jax.vmap(lambda k: jax.random.fold_in(k, it))(keys)
            cache_p = jax.vmap(dense.rebuild_cache)(data.D_t, data.invS2_t,
                                                    st.M_p, st.M_a)
            atoms_p, M_p, _, _, _, _ = run_updates_pallas_multi(
                kup, st.atoms_p, st.M_p, cache_p, temp, n_p_fix, ck_p,
                data.mass_p, invS2=data.invS2_t, other_M=st.M_a,
                s_max=cfg.s_max)
            return st.__class__(atoms_a=st.atoms_a, atoms_p=atoms_p,
                                M_a=st.M_a, M_p=M_p)
        return jax.lax.fori_loop(0, REPS, body, state)

    @jax.jit
    def loop_rebuilds(state):
        def body(it, st):
            cache_a = jax.vmap(dense.rebuild_cache)(data.D, data.invS2,
                                                    st.M_a, st.M_p)
            cache_p = jax.vmap(dense.rebuild_cache)(data.D_t, data.invS2_t,
                                                    st.M_p, st.M_a)
            da = cache_a.Y.mean() * 1e-20
            dp = cache_p.Y.mean() * 1e-20
            return st.__class__(atoms_a=st.atoms_a, atoms_p=st.atoms_p,
                                M_a=st.M_a + da, M_p=st.M_p + dp)
        return jax.lax.fori_loop(0, REPS, body, state)

    @jax.jit
    def loop_rng(key0):
        def body(it, k):
            ks = jax.vmap(lambda kk: jax.random.split(
                jax.random.fold_in(kk, it), 4))(k)
            B = ck_a.batch
            uni = jax.vmap(lambda kk: jax.vmap(
                lambda i: jax.random.uniform(
                    jax.random.fold_in(kk, i), (16, B), jnp.float32))(
                jnp.arange(cfg.s_max)))(ks[:, 2])
            uniB = jax.vmap(lambda kk: jax.vmap(
                lambda i: jax.random.uniform(
                    jax.random.fold_in(kk, i), (16, ck_p.batch),
                    jnp.float32))(jnp.arange(cfg.s_max)))(ks[:, 3])
            return (ks[:, 0] + jnp.uint32(uni.mean() * 0 + uniB.mean() * 0)).astype(key0.dtype)
        return jax.lax.fori_loop(0, REPS, body, key0)

    for name, fn, arg in (("full iter", loop_full, state),
                          ("A rebuild+kernel", loop_kernel_a, state),
                          ("P rebuild+kernel", loop_kernel_p, state),
                          ("rebuilds only", loop_rebuilds, state),
                          ("rng only", loop_rng, keys)):
        out = fn(arg)
        fence(out)
        t0 = time.perf_counter()
        out = fn(arg)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:18s}: {dt:7.3f} ms/iter")


if __name__ == "__main__":
    main()
