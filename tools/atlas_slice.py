"""Atlas-scale single-chip slice: the largest SURVEY §7.10 configuration
that fits one v5e (30k genes x N cells, k=50, sparse, SparseShardedEngine
on a 1-device mesh). Records updates/s and device memory against
models/sparse.atlas_memory_plan into artifacts/ATLAS_RUN.json.

Usage: python tools/atlas_slice.py [n_cells] [k] [iters]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_coo(n_genes, n_cells, nnz_per_cell, rng):
    """Synthetic scRNA-like counts. Gene popularity skew is CAPPED:
    the ELL layout pads every row to the max row-nnz, so a handful of
    housekeeping-grade genes (detected in most cells) would blow the
    padding up by orders of magnitude. Real atlas ingestion should
    bucket such rows (documented limitation; the memory plan assumes
    nnz-proportional storage)."""
    gene_w = rng.lognormal(0.0, 0.3, n_genes)
    gene_w /= gene_w.sum()
    nnz = int(n_cells * nnz_per_cell)
    rows = rng.choice(n_genes, nnz, p=gene_w).astype(np.int32)
    cols = rng.integers(0, n_cells, nnz).astype(np.int32)
    # dedupe (keep first occurrence)
    key = rows.astype(np.int64) * n_cells + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.poisson(2.0, len(rows)).astype(np.float32) + 1.0
    return rows, cols, vals


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    n_genes = 30_000
    nnz_per_cell = 450  # ~1.5% density

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from cogaps_tpu.params import CogapsParams
    from cogaps_tpu.io.h5 import CooMatrix
    from cogaps_tpu.parallel.sparse_sharded import atlas_memory_plan
    from cogaps_tpu.parallel.sparse_sharded import SparseShardedEngine

    rng = np.random.default_rng(0)
    t0 = time.time()
    rows, cols, vals = synth_coo(n_genes, n_cells, nnz_per_cell, rng)
    print(f"synth: {len(vals)/1e6:.1f}M nnz in {time.time()-t0:.0f}s",
          flush=True)

    plan = atlas_memory_plan(n_cells, n_genes, k,
                             len(vals) / (n_genes * n_cells), 1)
    print("memory plan:", plan, flush=True)

    params = CogapsParams(n_patterns=k, n_iterations=1000, seed=1,
                          output_frequency=0, sparse_optimization=True,
                          # ~1.5 s/iteration at this scale: keep each
                          # dispatched program short of the device
                          # watchdog (PERF_NOTES.md)
                          dispatch_iters=8)
    cfg = params.engine_config(n_genes, n_cells)
    coo = CooMatrix(rows=rows, cols=cols, vals=vals,
                    shape=(n_genes, n_cells))
    mesh = Mesh(np.array(jax.devices()[:1]), ("genes",))
    t0 = time.time()
    eng = SparseShardedEngine(coo, cfg, mesh)
    state, stats = eng.init_state(), eng.init_stats()
    key = jax.random.PRNGKey(1)
    print(f"engine built in {time.time()-t0:.0f}s", flush=True)

    # warmup (compile + atom growth toward the working regime)
    t0 = time.time()
    warm = int(os.environ.get("ATLAS_WARM", "60"))
    state, stats = eng.run_phase(state, stats, key, 0, 0, warm)
    s = jax.device_get(stats)
    print(f"compile+{warm}it in {time.time()-t0:.0f}s", flush=True)
    base_upd = (int(np.sum(np.asarray(s.upd_hi, np.int64))) << 30) + int(
        np.sum(np.asarray(s.upd_lo, np.int64)))

    t0 = time.perf_counter()
    state, stats = eng.run_phase(state, stats, key, 0, warm, warm + iters)
    s = jax.device_get(stats)
    dt = time.perf_counter() - t0
    total_upd = (int(np.sum(np.asarray(s.upd_hi, np.int64))) << 30) + int(
        np.sum(np.asarray(s.upd_lo, np.int64))) - base_upd

    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {kk: int(vv) for kk, vv in ms.items()
               if kk in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit")}
    except Exception:
        pass

    n_atoms = int(np.sum(np.asarray(
        jax.device_get(state).atoms_a.n)))
    out = {
        "atoms_a_at_measurement": n_atoms,
        "config": f"{n_genes}x{n_cells} k={k} nnz={len(vals)}",
        "iters_measured": iters,
        "elapsed_s": round(dt, 2),
        "updates_per_second": round(total_upd / dt, 1),
        "updates_total": total_upd,
        "ms_per_iteration": round(dt / iters * 1e3, 1),
        "device_memory": mem,
        "memory_plan": plan,
        "backend": jax.default_backend(),
        "path": "SparseShardedEngine (XLA sweep; the fused kernel's "
                "VMEM-resident Z table does not fit at this scale)",
    }
    print(json.dumps(out, indent=1), flush=True)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/ATLAS_RUN.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
