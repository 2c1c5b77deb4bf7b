"""Decompose real-path iteration time: full vs A-only vs P-only.

Times _phase_span_multi (the real bench path) for N iterations at
steady state, with which_matrix_fixed ablations.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from cogaps_tpu.io import parsers
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.parallel.multichain import (MultichainEngine,
                                            stack_device_data)
from cogaps_tpu.engine import EQUILIBRATION, SAMPLING

NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_IT = 200


def run(fixed):
    D, _, _ = parsers.read_matrix("data/GIST.csv")
    params = CogapsParams(n_patterns=7, n_iterations=1000, seed=42,
                          output_frequency=0)
    cfg = params.engine_config(*D.shape)
    if fixed:
        cfg = type(cfg)(**{**cfg.__dict__, "which_matrix_fixed": fixed})
    data = stack_device_data([D] * NCH, None, cfg)
    eng = MultichainEngine(data, cfg)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(NCH) + 42)
    if fixed == "A":
        fp = np.random.default_rng(0).gamma(
            2.0, 1.0, (NCH, D.shape[0], 7)).astype(np.float32)
    elif fixed == "P":
        fp = np.random.default_rng(0).gamma(
            2.0, 1.0, (NCH, D.shape[1], 7)).astype(np.float32)
    else:
        fp = None
    state, stats = eng.init_state(fp), eng.init_stats()
    # warm into steady state + compile
    state, stats = eng.run_phase(state, stats, keys, EQUILIBRATION, 0,
                                 400)
    jax.device_get(stats.upd_lo)
    t0 = time.perf_counter()
    state, stats = eng.run_phase(state, stats, keys, EQUILIBRATION, 400,
                                 400 + N_IT)
    s = jax.device_get(stats)
    dt = time.perf_counter() - t0
    upd = (int(np.sum(s.upd_hi.astype(np.int64))) * (1 << 30)
           + int(np.sum(s.upd_lo.astype(np.int64))))
    print(f"fixed={fixed or 'none'}: {dt/N_IT*1e3:.3f}ms/iter, "
          f"sweepsA={int(np.sum(s.sweep_counts[:,0]))/N_IT/NCH:.1f} "
          f"sweepsP={int(np.sum(s.sweep_counts[:,1]))/N_IT/NCH:.1f}",
          flush=True)


for fx in (None, "P", "A"):
    run(fx)
