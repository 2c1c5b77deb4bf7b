"""Large-scale sparse benchmark on the ELL-native fused-kernel path
(VERDICT r4 #5: sparse bench on the kernel path past the dense-weight
bound, no dense (G x S) weight arrays anywhere).

The engine auto-resolves sparse_table_mode="ell" here: G*S = 1.2e9
exceeds the dense-weight bound, while the ELL-native table builder's
(G + S) * k^2 working set is a few M floats. Nothing densifies:
ingestion is CooMatrix -> ELL (models/sparse.coo_to_ell), and
per-iteration tables come from models/sparse.kernel_tables_ell.

Scale ceiling (measured round 5): tall data overflows the
VMEM-resident sweep kernel's scoped VMEM (20k x 120k k=7 needs 114M
vs the ~110M cap even at B=256 / capacity 2^16; 20k x 60k OOMs the
same way), so the mode resolver gates "ell" to max-dim <= 2^15 and
the >=100k-cell regime belongs to the HBM-DMA atlas kernel —
measured separately in artifacts/ATLAS_KERNEL_RUN_120K.json
(tools/atlas_kernel_run.py 120000 7 24 512 160 400). This bench pins
the largest ELL-mode scale.

Usage: python tools/sparse_ell_bench.py [genes] [cells] [nnz_per_cell] [iters]
Writes artifacts/SPARSE_ELL_BENCH.json.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from atlas_slice import synth_coo  # noqa: E402


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    nnz_per_cell = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 60
    k = 7

    import jax
    from cogaps_tpu.engine import EQUILIBRATION
    from cogaps_tpu.io.h5 import CooMatrix
    from cogaps_tpu.params import CogapsParams
    from cogaps_tpu.sparse_engine import SparseGapsEngine

    rng = np.random.default_rng(3)
    t0 = time.time()
    rows, cols, vals = synth_coo(G, S, nnz_per_cell, rng)
    print(f"synth: {len(vals)/1e6:.1f}M nnz in {time.time()-t0:.0f}s",
          flush=True)
    coo = CooMatrix(rows=rows.astype(np.int64), cols=cols.astype(np.int64),
                    vals=vals, shape=(G, S))

    params = CogapsParams(n_patterns=k, n_iterations=2000, seed=11,
                          sparse_optimization=True, output_frequency=0)
    cfg = params.engine_config(G, S)
    t0 = time.time()
    eng = SparseGapsEngine(coo, cfg)
    mode = eng.config.sparse_table_mode
    print(f"engine build: {time.time()-t0:.0f}s mode={mode} "
          f"ellA L={eng.data.ell_a.idx.shape[1]} "
          f"ellP L={eng.data.ell_p.idx.shape[1]}", flush=True)
    assert mode == "ell", mode

    state = eng.init_state()
    stats = eng.init_stats()
    key = jax.random.PRNGKey(11)

    t0 = time.time()
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, 0, 2)
    jax.device_get(state.atoms_a.n)
    print(f"compile + 2 iters: {time.time()-t0:.0f}s", flush=True)

    warm = 40
    t0 = time.time()
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, 2, warm)
    jax.device_get(state.atoms_a.n)
    print(f"warm to it={warm}: {time.time()-t0:.0f}s  atoms_a="
          f"{int(state.atoms_a.n)} atoms_p={int(state.atoms_p.n)}",
          flush=True)

    def updates(ss):
        return (int(jax.device_get(ss.upd_hi)) * (1 << 30)
                + int(jax.device_get(ss.upd_lo)))

    upd0 = updates(stats)
    t0 = time.time()
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, warm,
                                warm + iters)
    jax.device_get(state.atoms_a.n)
    dt = time.time() - t0
    upd1 = updates(stats)
    ups = (upd1 - upd0) / dt
    print(f"{iters} iters: {dt:.1f}s -> {ups:,.0f} updates/s "
          f"({dt/iters*1000:.0f} ms/iter)", flush=True)

    out = {
        "what": "largest-ELL-mode sparse benchmark on the fused-kernel "
                "path (no dense weights anywhere)",
        "config": f"{G}x{S} k={k} nnz={len(vals)}",
        "sparse_table_mode": mode,
        "iters_measured": iters,
        "elapsed_s": round(dt, 2),
        "updates_per_second": round(ups, 1),
        "ms_per_iteration": round(dt / iters * 1000, 1),
        "atoms_a_at_measurement": int(state.atoms_a.n),
        "atoms_p_at_measurement": int(state.atoms_p.n),
        "backend": jax.default_backend(),
        "notes": [
            "mode='ell' = fused Pallas sweep kernel fed by "
            "models/sparse.kernel_tables_ell (row-Gram G tables built "
            "by ELL gathers); dense (G x S) weights are never built",
            "measured mid-equilibration (atom field still growing; "
            "budget scales with atom count)",
        ],
    }
    with open("artifacts/SPARSE_ELL_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
