"""In-situ timing of the fused kernel: N chained update calls inside
ONE jitted program (dispatch amortized), A-sampler and P-sampler shapes.

Usage: python tools/perf_fused.py [NCH] [BA] [SMAX] [NSTEPS] [SAMPLER]
"""
import os
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
    NSTEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3200
    sampler = sys.argv[5] if len(sys.argv) > 5 else "A"
    REPS = int(os.environ.get("REPS", "50"))

    D, _, _ = parsers.read_matrix("data/GIST.csv")
    if sampler == "P":
        D = D.T  # P side sees transposed data
    k = 7
    cfg = CogapsParams(n_patterns=k, n_iterations=10, seed=0
                       ).engine_config(*parsers.read_matrix(
                           "data/GIST.csv")[0].shape)
    data = prepare_device_data(D, None,
                               CogapsParams(n_patterns=k, n_iterations=10,
                                            seed=0).engine_config(*D.shape))
    G, S = D.shape
    cap = int(os.environ.get("CAP", "0")) or (cfg.capacity_a if sampler == "A" else cfg.capacity_p)
    consts = make_consts(G, S, k, cap, B, cfg.alpha_a)
    C = consts.capacity
    print(f"{sampler}: NCH={NCH} B={B} s_max={s_max} cap={C} "
          f"NR={G} m={S} nsteps={NSTEPS}", flush=True)

    rng = np.random.default_rng(0)
    n0 = min(3000, C // 2) if sampler == "A" else 100
    elem = np.where(np.arange(C)[None, :] < n0,
                    rng.integers(0, consts.n_bins, (NCH, C)), -1)
    mass = np.where(np.arange(C)[None, :] < n0,
                    rng.gamma(2.0, 1.0, (NCH, C)), 0.0)
    atoms = AtomTable(mass=jnp.asarray(mass, jnp.float32),
                      elem=jnp.asarray(elem, jnp.int32),
                      n=jnp.full((NCH,), n0, jnp.int32))
    M = np.zeros((NCH, G * k), np.float32)
    for ch in range(NCH):
        np.add.at(M[ch], elem[ch][elem[ch] >= 0], mass[ch][elem[ch] >= 0])
    M = jnp.asarray(M.reshape(NCH, G, k))
    other = jnp.asarray(rng.gamma(2.0, 1.0, (NCH, S, k)), jnp.float32)
    invS2 = jnp.broadcast_to(jnp.asarray(data.invS2)[None], (NCH, G, S))
    Dd = jnp.broadcast_to(jnp.asarray(data.D)[None], (NCH, G, S))
    cache = dense.DenseCache(Y=jax.vmap(
        lambda d, i, m, o: dense.rebuild_cache(d, i, m, o).Y)(
            Dd, invS2, M, other))
    mp = MassParams(
        lam=jnp.full((NCH,), float(data.mass_a.lam)),
        max_gibbs_mass=jnp.full((NCH,), float(data.mass_a.max_gibbs_mass)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(NCH))
    n_steps = jnp.full((NCH,), NSTEPS, jnp.int32)

    def one(carry, i):
        at, m, ca, tot, ns_tot = carry
        ks = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        at, m, ca, done, ns, _ = run_updates_pallas_multi(
            ks, at, m, ca, jnp.float32(1.0), n_steps, consts, mp,
            invS2=invS2, other_M=other, s_max=s_max)
        return (at, m, ca, tot + done, ns_tot + ns), 0.0

    @jax.jit
    def run(at, m, ca):
        z = jnp.zeros((NCH,), jnp.int32)
        (at, m, ca, tot, ns), _ = jax.lax.scan(
            one, (at, m, ca, z, z), jnp.arange(REPS))
        return at, m, ca, tot, ns

    out = run(atoms, M, cache)
    tot = jax.device_get(out[3])
    t0 = time.perf_counter()
    out = run(atoms, M, cache)
    tot = jax.device_get(out[3])
    ns = jax.device_get(out[4])
    dt = time.perf_counter() - t0
    total = int(np.sum(tot))
    sweeps = int(np.sum(ns)) / NCH
    print(f"{REPS} calls in {dt*1e3:.1f}ms -> {dt/REPS*1e3:.3f}ms/call, "
          f"{sweeps/REPS:.1f} sweeps/call, "
          f"{dt/ (sweeps) *1e6 if sweeps else 0:.1f}us/sweep(chain-shared), "
          f"upd/s={total/dt/1e6:.1f}M", flush=True)


if __name__ == "__main__":
    main()
