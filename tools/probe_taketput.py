"""Probe: XLA big-gather (take) throughput on the real backend.

The atlas redesign rebuilds per-nonzero partner "planes" once per phase:
    plane[c, j] = other[idx[j], c]   for all nnz positions j
i.e. one big row-gather of ~22M rows from a (50k, 64) table, 5.6 GB out.
PERF_NOTES records SMALL dynamic gathers inside big programs serializing
at ~100-170us per op — this measures whether ONE HUGE gather call runs
at bandwidth instead (per-op overhead amortized).

Run: python tools/probe_taketput.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 50_000       # partner rows (atlas n_samples)
K = 64           # padded k
NNZ = 22_000_000


def main():
    rng = np.random.default_rng(0)
    other = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, size=NNZ).astype(np.int32))

    @jax.jit
    def take_rows(o, ix):
        return jnp.take(o, ix, axis=0)

    out = take_rows(other, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = take_rows(other, idx)
    s = float(jax.device_get(jnp.sum(out[:: 1_000_000, 0])))
    dt = time.perf_counter() - t0
    gb = NNZ * K * 4 / 1e9
    print(f"take {NNZ} rows x {K} f32: {dt*1e3:.1f} ms "
          f"-> {gb/dt:.1f} GB/s written (checksum {s:.3f})")

    # column-plane variant: gather a SINGLE column's values for all nnz
    # (the thin layout actually used per plane): volume nnz * 4 B
    @jax.jit
    def take_col(o, ix):
        return jnp.take(o[:, 0], ix)

    out2 = take_col(other, idx)
    out2.block_until_ready()
    t0 = time.perf_counter()
    out2 = take_col(other, idx)
    s2 = float(jax.device_get(jnp.sum(out2[:: 1_000_000])))
    dt2 = time.perf_counter() - t0
    print(f"take {NNZ} scalars (one column): {dt2*1e3:.1f} ms "
          f"-> {NNZ*4/1e9/dt2:.1f} GB/s (checksum {s2:.3f})")

    del out
    # all-k column planes as one (k, nnz) gather from the transposed
    # table: plane = other.T[:, idx]
    @jax.jit
    def take_planes(o, ix):
        return jnp.take(o.T, ix, axis=1)

    out3 = take_planes(other, idx)
    out3.block_until_ready()
    t0 = time.perf_counter()
    out3 = take_planes(other, idx)
    s3 = float(jax.device_get(jnp.sum(out3[0, :: 1_000_000])))
    dt3 = time.perf_counter() - t0
    print(f"take (k={K}, {NNZ}) planes via transposed table: "
          f"{dt3*1e3:.1f} ms -> {gb/dt3:.1f} GB/s (checksum {s3:.3f})")


if __name__ == "__main__":
    main()
