"""Probe: per-row-DMA issue rate, measured INSIDE one kernel.

probe_dma.py p3t (a lax.scan over 16 pallas_calls) wedged on this
backend, so this variant runs R gather passes inside ONE kernel: each
pass issues B row-DMAs from an HBM table into a VMEM buffer (ring of
NSEM semaphores), with the pass's indices derived from the previous
buffer contents (true data dependence between passes). Two R values
give a slope that cancels dispatch/compile constants.

Run: python -u tools/probe_dma2.py [B ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
K = 128
NB = 1 << 20


def _kern(B, R, NSEM, idx_ref, tbl_ref, out_ref, buf, sscr, vscr, sem,
          vsem):
    def one_pass(p, idx_vec):
        # addresses -> SMEM
        vscr[:] = idx_vec
        pltpu.make_async_copy(vscr, sscr, vsem).start()
        pltpu.make_async_copy(vscr, sscr, vsem).wait()

        def issue(j, _):
            i = sscr[0, j].astype(jnp.int32)
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(i, 1)], buf.at[pl.ds(j, 1)],
                sem.at[j % NSEM]).start()
            return _

        jax.lax.fori_loop(0, B, issue, 0)

        def drain(j, _):
            i = sscr[0, j].astype(jnp.int32)
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(i, 1)], buf.at[pl.ds(j, 1)],
                sem.at[j % NSEM]).wait()
            return _

        jax.lax.fori_loop(0, B, drain, 0)
        # next pass's indices depend on gathered data (mod-perturbed)
        col0 = buf[:, 0].reshape(1, B)  # row id * 0.001
        nxt = jnp.floor(idx_vec * 0.5 + col0) % float(NB)
        return nxt

    final = jax.lax.fori_loop(0, R, one_pass, idx_ref[:])
    out_ref[:] = final + buf[0, 0]


def run(B, R, NSEM=16):
    tbl_np = (np.arange(NB, dtype=np.float32)[:, None]
              + np.zeros((1, K), np.float32))
    tbl = jnp.asarray(tbl_np)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NB, (1, B)).astype(np.float32))

    call = pl.pallas_call(
        functools.partial(_kern, B, R, NSEM),
        out_shape=jax.ShapeDtypeStruct((1, B), F32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, K), F32),
                        pltpu.SMEM((1, B), F32),
                        pltpu.VMEM((1, B), F32),
                        pltpu.SemaphoreType.DMA((NSEM,)),
                        pltpu.SemaphoreType.DMA(())],
    )
    o = jax.device_get(call(idx, tbl))  # compile + run once
    t0 = time.perf_counter()
    o = jax.device_get(call(idx, tbl))
    dt = time.perf_counter() - t0
    return dt, float(o.sum())


def main():
    bs = [int(a) for a in sys.argv[1:]] or [256]
    for B in bs:
        r1, r2 = 16, 80
        d1, s1 = run(B, r1)
        d2, s2 = run(B, r2)
        per_pass = (d2 - d1) / (r2 - r1)
        print(f"B={B}: R={r1}: {d1*1e3:.2f} ms, R={r2}: {d2*1e3:.2f} ms "
              f"-> {per_pass*1e6:.1f} us/pass, "
              f"{per_pass/B*1e9:.0f} ns/row-DMA", flush=True)


if __name__ == "__main__":
    main()
