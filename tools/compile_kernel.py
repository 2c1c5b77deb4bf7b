"""Fast compile-and-time harness for the fused kernel on the real TPU.

Usage: python tools/compile_kernel.py [NCH] [BA] [SMAX]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from cogaps_tpu.io import parsers
from cogaps_tpu.engine import prepare_device_data
from cogaps_tpu.models import dense
from cogaps_tpu.ops.atoms import AtomTable
from cogaps_tpu.ops.pallas_sweep import run_updates_pallas_multi
from cogaps_tpu.ops.sweep import MassParams, make_consts
from cogaps_tpu.params import CogapsParams


def main():
    NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    s_max = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    D, _, _ = parsers.read_matrix("data/GIST.csv")
    k = 7
    cfg = CogapsParams(n_patterns=k, n_iterations=10, seed=0
                       ).engine_config(*D.shape)
    data = prepare_device_data(D, None, cfg)
    G, S = D.shape
    consts = make_consts(G, S, k, cfg.capacity_a, B, cfg.alpha_a)
    C = consts.capacity
    print(f"NCH={NCH} B={B} s_max={s_max} capacity={C}", flush=True)

    rng = np.random.default_rng(0)
    n0 = 3000
    elem = np.where(np.arange(C)[None, :] < n0,
                    rng.integers(0, consts.n_bins, (NCH, C)), -1)
    mass = np.where(np.arange(C)[None, :] < n0,
                    rng.gamma(2.0, 1.0, (NCH, C)), 0.0)
    atoms = AtomTable(mass=jnp.asarray(mass, jnp.float32),
                      elem=jnp.asarray(elem, jnp.int32),
                      n=jnp.full((NCH,), n0, jnp.int32))
    M = jnp.zeros((NCH, G, k), jnp.float32)
    for ch in range(NCH):
        Mi = np.zeros((G * k,), np.float32)
        np.add.at(Mi, elem[ch][elem[ch] >= 0],
                  mass[ch][elem[ch] >= 0])
        M = M.at[ch].set(jnp.asarray(Mi.reshape(G, k)))
    other = jnp.asarray(rng.gamma(2.0, 1.0, (NCH, S, k)), jnp.float32)
    invS2 = jnp.broadcast_to(data.invS2[None], (NCH, G, S))
    Dd = jnp.broadcast_to(data.D[None], (NCH, G, S))
    cache = dense.DenseCache(Y=jax.vmap(
        lambda d, i, m, o: dense.rebuild_cache(d, i, m, o).Y)(
            Dd, invS2, M, other))
    mass_p = MassParams(
        lam=jnp.full((NCH,), float(data.mass_a.lam)),
        max_gibbs_mass=jnp.full((NCH,), float(data.mass_a.max_gibbs_mass)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(NCH))
    import os
    NSTEPS = int(os.environ.get("NSTEPS", "3200"))
    n_steps = jnp.full((NCH,), NSTEPS, jnp.int32)

    f = jax.jit(lambda ks, at, m, ca, ns: run_updates_pallas_multi(
        ks, at, m, ca, jnp.float32(1.0), ns, consts, mass_p,
        invS2=invS2, other_M=other, s_max=s_max))

    t0 = time.perf_counter()
    out = f(keys, atoms, M, cache, n_steps)
    done = jax.device_get(out[3])
    t_compile = time.perf_counter() - t0
    print(f"compiled+ran in {t_compile:.1f}s; done={done}", flush=True)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(keys, out[0], out[1], out[2], n_steps)
    done = jax.device_get(out[3])
    ns = jax.device_get(out[4])
    dt = (time.perf_counter() - t0) / reps
    total = int(np.sum(done))
    print(f"per-call {dt*1e3:.2f}ms, done={done[0]} x{NCH}, "
          f"sweeps={ns}, upd/s={total/dt/1e6:.2f}M", flush=True)


if __name__ == "__main__":
    main()
