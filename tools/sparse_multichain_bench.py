"""scCoGAPS concurrency artifact (VERDICT r4 #6): wall-clock of the
round-5 concurrent sparse multichain program (all nSets subset chains
as ONE fused-kernel program) vs the serialized per-subset loop it
replaced (estimated as nSets x one subset chain run back-to-back —
exactly what rounds <= 4 executed).

Usage: python tools/sparse_multichain_bench.py [genes] [cells] [nsets]
Writes artifacts/SPARSE_MULTICHAIN.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cogaps_tpu.engine import EQUILIBRATION, SAMPLING
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.sparse_engine import (SparseGapsEngine,
                                      SparseMultichainEngine,
                                      stack_sparse_device_data)


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    nsets = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_it = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    k = 7

    rng = np.random.default_rng(0)
    A = (rng.gamma(2, 1, (G, k)) * (rng.random((G, k)) < 0.3)
         ).astype(np.float32)
    P = (rng.gamma(2, 1, (S, k)) * (rng.random((S, k)) < 0.3)
         ).astype(np.float32)
    D = (A @ P.T) * (rng.random((G, S)) < 0.12)
    D = D.astype(np.float32)
    print(f"data {G}x{S}, density {(D > 0).mean():.3f}", flush=True)

    params = CogapsParams(n_patterns=k, n_iterations=n_it, seed=1,
                          output_frequency=0)
    sets = np.array_split(rng.permutation(S), nsets)
    subDs = [D[:, np.sort(s)] for s in sets]
    Smax = max(d.shape[1] for d in subDs)
    cfg = params.engine_config(G, Smax)
    keys = jnp.stack([jax.random.PRNGKey(1)] * nsets)

    def run_concurrent():
        data, shapes = stack_sparse_device_data(subDs, cfg, pad_rows=G,
                                                pad_cols=Smax)
        eng = SparseMultichainEngine(data, cfg)
        st, ss = eng.init_state(), eng.init_stats()
        st, ss = eng.run_phase(st, ss, keys, EQUILIBRATION)
        st, ss = eng.run_phase(st, ss, keys, SAMPLING)
        return jax.device_get(ss)

    def run_one_subset():
        eng = SparseGapsEngine(subDs[0], cfg)
        st, ss = eng.init_state(), eng.init_stats()
        key = jax.random.PRNGKey(1)
        st, ss = eng.run_phase(st, ss, key, EQUILIBRATION)
        st, ss = eng.run_phase(st, ss, key, SAMPLING)
        return jax.device_get(ss)

    # warmup (compile) then timed
    run_concurrent()
    t0 = time.perf_counter()
    ssc = run_concurrent()
    t_conc = time.perf_counter() - t0

    run_one_subset()
    t0 = time.perf_counter()
    ss1 = run_one_subset()
    t_one = time.perf_counter() - t0

    upd_conc = int(np.sum(ssc.upd_hi.astype(np.int64))) * (1 << 30) \
        + int(np.sum(ssc.upd_lo.astype(np.int64)))
    out = {
        "what": "concurrent sparse multichain (one program, all subset "
                "chains) vs serialized per-subset runs (round<=4 path)",
        "config": {"genes": G, "cells": S, "n_sets": nsets, "k": k,
                   "n_iterations": n_it,
                   "density": float((D > 0).mean())},
        "concurrent_wall_s": round(t_conc, 3),
        "one_subset_wall_s": round(t_one, 3),
        "serialized_estimate_s": round(t_one * nsets, 3),
        "speedup_vs_serialized": round(t_one * nsets / t_conc, 2),
        "concurrent_updates_per_s": round(upd_conc / t_conc, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out, indent=1))
    with open("artifacts/SPARSE_MULTICHAIN.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
