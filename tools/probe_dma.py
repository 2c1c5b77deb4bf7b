"""Probe: in-kernel dynamic-row DMA gather from an HBM-resident table.

The atlas-scale sparse path needs zrow = G[elem, :] gathers from a
G table that is 300-500 MB — far beyond VMEM. One-hot transport matmuls
scale with TABLE size (not gathered size), so the only viable primitive
is a per-row DMA with a runtime offset:

    make_async_copy(hbm_ref.at[pl.ds(idx, 1)], scratch.at[slot], sem)

Open questions this probe answers on the real backend:
  P1  does an ANY/HBM-space input + dynamic-offset DMA compile and run?
  P2  how do we turn a (1, B) f32 vreg of addresses into per-DMA scalar
      offsets?  (a) direct dynamic scalar read from a VMEM ref,
      (b) VMEM->SMEM DMA then SMEM scalar reads.
  P3  issue cost per row-DMA at B in {256, 1024}: all-issue-then-wait
      with a semaphore ring.

Run:  python tools/probe_dma.py p1 p2 p3
Each stage is independent so a compiler hang in one doesn't mask others.
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
K = 128        # row width = one full lane tile
NB = 1 << 20    # 1M table rows (atlas NB = n_rows*k ~ 1.5M)


def _table(nb=NB, k=K):
    g = np.arange(nb, dtype=np.float32)[:, None]
    c = np.arange(k, dtype=np.float32)[None, :]
    return jnp.asarray(g * 0.001 + c)  # row-identifiable values


# ----------------------------------------------------------------- P1
def p1():
    """One dynamic-offset DMA from an ANY-space ref, offset from SMEM."""

    def kern(idx_sref, tbl_ref, out_ref, scratch, sem):
        i = idx_sref[0]
        dma = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(i, 8)], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[:] = scratch[:]

    tbl = _table()
    idx = jnp.asarray([12345], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, K), F32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, K), F32),
                        pltpu.SemaphoreType.DMA(())],
    )(idx, tbl)
    out = jax.device_get(out)
    ref = jax.device_get(tbl[12345:12353])
    ok = np.allclose(out, ref)
    print(f"P1 dynamic-offset DMA from ANY ref: {'OK' if ok else 'FAIL'}")
    if not ok:
        print(out[:2, :4], ref[:2, :4])


# ----------------------------------------------------------------- P2
def p2a():
    """Direct dynamic scalar read from a VMEM ref: v = ref[0, i]."""

    def kern(tbl_ref, out_ref):
        def body(j, acc):
            v = tbl_ref[0, j * 7]
            return acc + v

        out_ref[0, 0] = jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    tbl = jnp.arange(256, dtype=jnp.float32).reshape(1, 256)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 1), F32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tbl)
    want = float(sum(j * 7 for j in range(8)))
    got = float(jax.device_get(out)[0, 0])
    print(f"P2a dynamic scalar read from VMEM ref: "
          f"{'OK' if got == want else f'FAIL ({got} != {want})'}")


def p2b():
    """(1, B) f32 vreg -> VMEM scratch -> SMEM via DMA -> scalar reads."""
    B = 256

    def kern(x_ref, out_ref, vscr, sscr, sem):
        vscr[:] = x_ref[:] * 2.0 + 1.0  # computed vector (a vreg value)
        pltpu.make_async_copy(vscr, sscr, sem).start()
        pltpu.make_async_copy(vscr, sscr, sem).wait()

        def body(j, acc):
            return acc + sscr[0, j * 31]

        out_ref[0, 0] = jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    x = jnp.arange(B, dtype=jnp.float32).reshape(1, B)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 1), F32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((1, B), F32),
                        pltpu.SMEM((1, B), F32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    want = float(sum(2 * 31 * j + 1 for j in range(8)))
    got = float(jax.device_get(out)[0, 0])
    print(f"P2b vreg->VMEM->SMEM DMA + scalar reads: "
          f"{'OK' if got == want else f'FAIL ({got} != {want})'}")


# ----------------------------------------------------------------- P3
def _gather_kernel(B, NSEM, idx_ref, tbl_ref, out_ref, sscr, sem, vsem):
    """Gather B rows of tbl into out via per-row DMAs.
    idx arrives as a (1, B) f32 VMEM vector (as it would in the sweep
    kernel); addresses go vreg -> SMEM -> scalar loop."""
    pltpu.make_async_copy(idx_ref, sscr, vsem).start()
    pltpu.make_async_copy(idx_ref, sscr, vsem).wait()

    def issue(j, _):
        i = sscr[0, j].astype(jnp.int32)
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(i, 1)], out_ref.at[pl.ds(j, 1)],
            sem.at[j % NSEM]).start()
        return _

    jax.lax.fori_loop(0, B, issue, 0)

    def drain(j, _):
        i = sscr[0, j].astype(jnp.int32)
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(i, 1)], out_ref.at[pl.ds(j, 1)],
            sem.at[j % NSEM]).wait()
        return _

    jax.lax.fori_loop(0, B, drain, 0)


def _mk_call(B, NSEM=16):
    return pl.pallas_call(
        functools.partial(_gather_kernel, B, NSEM),
        out_shape=jax.ShapeDtypeStruct((B, K), F32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, B), F32),
                        pltpu.SemaphoreType.DMA((NSEM,)),
                        pltpu.SemaphoreType.DMA(())],
    )


def _idx(B):
    rng = np.random.default_rng(0)
    return rng.integers(0, NB, size=(1, B)).astype(np.float32)


def p3c(B=64):
    """Correctness only — one small call."""
    tbl = _table()
    idx_np = _idx(B)
    print(f"P3c B={B} compiling...", flush=True)
    out = jax.device_get(_mk_call(B)(jnp.asarray(idx_np), tbl))
    ref = jax.device_get(tbl[idx_np[0].astype(np.int64)])
    ok = np.allclose(out, ref)
    print(f"P3c B={B} correctness: {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        bad = np.where(~np.all(np.isclose(out, ref), axis=1))[0]
        print("  bad rows:", bad[:8], out[bad[0], :4], ref[bad[0], :4])


def p3t(B=256, iters=16):
    """Steady-state timing: iters chained calls, fenced once."""
    tbl = _table()
    idx = jnp.asarray(_idx(B))
    call = _mk_call(B)

    @jax.jit
    def many(idx0):
        def step(ix, _):
            o = call(ix, tbl)
            # feed a data dependency back so calls serialize
            ix2 = (ix + o[0, 0] * 0.0) % NB
            return ix2, o[0, 0]

        _, outs = jax.lax.scan(step, idx0, None, length=iters)
        return outs

    print(f"P3t B={B} compiling...", flush=True)
    many(idx).block_until_ready()
    t0 = time.perf_counter()
    r = jax.device_get(many(idx))
    dt = time.perf_counter() - t0
    per_call = dt / iters * 1e6
    print(f"P3t B={B}: {per_call:.1f} us/call, {per_call / B * 1000:.0f} "
          f"ns/row-DMA  (sum={r.sum():.1f})", flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["p1", "p2a", "p2b"]
    for s in stages:
        if s.startswith("p3c"):
            p3c(int(s[3:] or 64))
        elif s.startswith("p3t"):
            p3t(int(s[3:] or 256))
        else:
            globals()[s]()
