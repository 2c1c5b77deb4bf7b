"""On-device validation of the TPU fast paths (the CPU test suite runs
the XLA/interpret oracle; this script exercises the REAL kernels on the
real chip and checks invariants + golden bands).

Run: python tools/validate_tpu.py
Writes artifacts/TPU_VALIDATION.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RESULTS = {}


def check(name, ok, detail):
    RESULTS[name] = {"pass": bool(ok), "detail": detail}
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}", flush=True)


def drift(state, chain=None):
    """max |M_a - bin-sum of atom masses| (the reference's debug
    invariant, AsynchronousGibbsSampler.h:237-270)."""
    import jax
    st = jax.device_get(state)
    Ma = np.asarray(st.M_a if chain is None else st.M_a[chain])
    elem = np.asarray(st.atoms_a.elem if chain is None
                      else st.atoms_a.elem[chain])
    mass = np.asarray(st.atoms_a.mass if chain is None
                      else st.atoms_a.mass[chain])
    n = int(st.atoms_a.n if chain is None else st.atoms_a.n[chain])
    M_re = np.zeros(Ma.size, np.float32)
    np.add.at(M_re, elem[:n], mass[:n])
    return float(np.abs(M_re - Ma.reshape(-1)).max())


def main():
    import jax
    import jax.numpy as jnp
    from cogaps_tpu.io import parsers
    from cogaps_tpu.params import CogapsParams
    from cogaps_tpu import api

    assert jax.default_backend() not in ("cpu",), "run on the TPU"
    D, _, _ = parsers.read_matrix("data/GIST.csv")
    z = np.load("data/gist.npz")
    golden_eq = float(np.mean(np.asarray(z["golden_chisqHistory"])[2:]))

    # 1. multichain fused span path (8 chains)
    from cogaps_tpu.parallel.multichain import (MultichainEngine,
                                                stack_device_data)
    from cogaps_tpu.engine import EQUILIBRATION, SAMPLING
    cfg = CogapsParams(n_patterns=7, n_iterations=1000, seed=42,
                       output_frequency=0).engine_config(*D.shape)
    data = stack_device_data([D] * 8, None, cfg)
    eng = MultichainEngine(data, cfg)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8) + 42)
    st, ss = eng.init_state(), eng.init_stats()
    st, ss = eng.run_phase(st, ss, keys, EQUILIBRATION)
    st, ss = eng.run_phase(st, ss, keys, SAMPLING)
    from cogaps_tpu.models import dense
    inv = jnp.asarray(1.0 / np.maximum(0.1 * D, 0.1) ** 2)
    cs = [float(dense.chisq_from_state(jnp.asarray(D), inv,
                                       st.M_a[c], st.M_p[c]))
          for c in range(3)]
    d0 = max(drift(st, c) for c in range(3))
    check("fused_span_8ch_drift", d0 < 0.01, f"max drift {d0:.2e}")
    check("fused_span_8ch_equilibrium",
          all(c < 1.35 * golden_eq for c in cs),
          f"chisq {np.round(cs, 0)} vs golden plateau {golden_eq:.0f}")

    # 2. 16-chain per-call path
    data = stack_device_data([D] * 16, None, cfg)
    eng = MultichainEngine(data, cfg)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(16) + 7)
    st, ss = eng.init_state(), eng.init_stats()
    st, ss = eng.run_phase(st, ss, keys, EQUILIBRATION)
    st, ss = eng.run_phase(st, ss, keys, SAMPLING)
    cs = [float(dense.chisq_from_state(jnp.asarray(D), inv,
                                       st.M_a[c], st.M_p[c]))
          for c in range(3)]
    d0 = max(drift(st, c) for c in range(3))
    check("percall_16ch_drift", d0 < 0.01, f"max drift {d0:.2e}")
    check("percall_16ch_equilibrium",
          all(c < 1.35 * golden_eq for c in cs),
          f"chisq {np.round(cs, 0)}")

    # 3. sparse tables path (api single chain)
    p = CogapsParams(n_patterns=7, n_iterations=800, seed=42,
                     output_frequency=0, sparse_optimization=True)
    r = api.CoGAPS(D, p, messages=False)
    check("sparse_tables_path",
          r.mean_chi_sq < 10000 and np.isfinite(r.mean_chi_sq),
          f"sparse meanChiSq {r.mean_chi_sq:.0f}")

    # 4. sharp-posterior regime with the shipped uncertainty
    U = np.asarray(z["uncertainty"])
    p = CogapsParams(n_patterns=7, n_iterations=1500, seed=42,
                     output_frequency=500)
    r = api.CoGAPS(D, p, uncertainty=U, messages=False)
    h = np.asarray(r.diagnostics["chisqHistory"], np.float64)
    check("uncertainty_convergence",
          h[-1] < 0.6 * h[0] and h[-1] / D.size < 2.5,
          f"chisq {h[0]:.0f} -> {h[-1]:.0f} (n={D.size})")

    # 5. checkpoint resume exactness on the TPU kernel path
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "ck.npz")
        p1 = CogapsParams(n_patterns=5, n_iterations=200, seed=3,
                          output_frequency=0, checkpoint_interval=100,
                          checkpoint_out_file=ck)
        r1 = api.CoGAPS(D, p1, messages=False)
        p2 = CogapsParams(n_patterns=5, n_iterations=200, seed=99,
                          output_frequency=0, checkpoint_in_file=ck)
        r2 = api.CoGAPS(D, p2, messages=False)
        same = np.allclose(r1.Amean, r2.Amean, rtol=1e-5, atol=1e-5)
        check("checkpoint_resume_exact", same,
              "resume(with different seed arg) == uninterrupted run")

    os.makedirs("artifacts", exist_ok=True)
    RESULTS["_meta"] = {"backend": jax.default_backend(),
                        "when": time.strftime("%Y-%m-%d %H:%M")}
    with open("artifacts/TPU_VALIDATION.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    n_fail = sum(1 for k, v in RESULTS.items()
                 if k != "_meta" and not v["pass"])
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
