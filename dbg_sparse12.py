import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.sparse_engine import SparseGapsEngine
from cogaps_tpu.engine import EQUILIBRATION

rng = np.random.default_rng(5)
A = rng.gamma(2.0, 2.0, (100, 3)) * (rng.random((100, 3)) < 0.4)
P = rng.gamma(2.0, 2.0, (50, 3)) * (rng.random((50, 3)) < 0.5)
D = (A @ P.T).astype(np.float32)

cfg = CogapsParams(n_patterns=3, n_iterations=600, seed=1).engine_config(100, 50)
eng = SparseGapsEngine(D, cfg)
state = eng.init_state(); stats = eng.init_stats()
key = jax.random.PRNGKey(1)
prev = state
for t in range(0, 300):
    prev = state
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, t, t + 1)
    ma = float(np.asarray(state.M_a).max()); mp = float(np.asarray(state.M_p).max())
    pma = float(np.asarray(prev.M_a).max()); pmp = float(np.asarray(prev.M_p).max())
    if (ma > 10 * max(pma, 100)) or (mp > 10 * max(pmp, 100)):
        print(f"JUMP at it {t}: maxMa {pma:.4g}->{ma:.4g} maxMp {pmp:.4g}->{mp:.4g}")
        np.savez("/tmp/jump_state.npz",
                 Ma=np.asarray(prev.M_a), Mp=np.asarray(prev.M_p),
                 ama=np.asarray(prev.atoms_a.mass), aea=np.asarray(prev.atoms_a.elem), na=int(prev.atoms_a.n),
                 amp=np.asarray(prev.atoms_p.mass), aep=np.asarray(prev.atoms_p.elem), npp=int(prev.atoms_p.n),
                 it=t)
        # which factor and element jumped?
        Ma2 = np.asarray(state.M_a); Mp2 = np.asarray(state.M_p)
        if ma > 10 * max(pma, 100):
            i = np.unravel_index(Ma2.argmax(), Ma2.shape)
            print("  A elem", i, "before", np.asarray(prev.M_a)[i], "after", Ma2[i])
        if mp > 10 * max(pmp, 100):
            i = np.unravel_index(Mp2.argmax(), Mp2.shape)
            print("  P elem", i, "before", np.asarray(prev.M_p)[i], "after", Mp2[i])
        break
    if t % 50 == 0:
        print(f"it {t} maxMa {ma:.4g} maxMp {mp:.4g} chisq {eng.chisq(state):.5g}")
