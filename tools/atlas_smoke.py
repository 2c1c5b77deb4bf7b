"""On-device smoke for the atlas DMA kernel (ops/pallas_atlas):
compiles the engine at a mid-sized config on the real chip, runs 22
iterations, and checks the atom-mass == matrix drift oracle.

Usage: python tools/atlas_smoke.py
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.engine import EQUILIBRATION
from cogaps_tpu.ops.atoms import total_mass_per_element
from cogaps_tpu.parallel import atlas_engine as ae
from test_atlas_engine import _toy_coo, _mk_engine

print("backend:", jax.default_backend(), flush=True)
coo = _toy_coo(G=512, S=384, k=8)
eng = _mk_engine(coo, k=8, n_iter=40, batch=256, group=32, seg=16,
                 capacity=8192, s_max=32)
print("interpret:", eng.interpret, flush=True)
state = eng.init_state(); stats = eng.init_stats()
key = jax.random.PRNGKey(7)
t0 = time.time()
state, stats = eng.run_phase(state, stats, key, EQUILIBRATION, stop_iter=2)
jax.device_get(state.mmir_a)
print(f"compile+2 iters: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
state, stats = eng.run_phase(state, stats, key, EQUILIBRATION,
                             start_iter=2, stop_iter=22)
jax.device_get(state.mmir_a)
dt = time.time() - t0
print(f"20 iters: {dt:.1f}s ({dt/20*1000:.0f} ms/iter)", flush=True)
k = eng.k
ok = True
for name, atoms, mmir, nr in (("A", state.atoms_a, state.mmir_a, eng.n_genes),
                               ("P", state.atoms_p, state.mmir_p, eng.n_samples)):
    per = np.asarray(total_mass_per_element(atoms, nr * k)).reshape(nr, k)
    M = np.asarray(mmir[:, :k])
    d = np.max(np.abs(M - per) / np.maximum(1.0, np.abs(per)))
    print(f"{name}: atoms={int(atoms.n)} max rel drift={d:.2e}", flush=True)
    ok &= d < 1e-3
print("SMOKE", "PASS" if ok else "FAIL", flush=True)
