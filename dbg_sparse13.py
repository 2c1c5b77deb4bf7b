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
hist = []
for t in range(0, 400, 5):
    prev = state
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, t, t + 5)
    ma = float(np.asarray(state.M_a).max()); mp = float(np.asarray(state.M_p).max())
    hist.append((t, ma, mp))
    if t > 60 and (ma > 5e3 or mp > 5e3):
        print(f"EXPLODE at it {t}: maxMa {ma:.5g} maxMp {mp:.5g}")
        for h in hist[-6:]:
            print("   ", h)
        np.savez("/tmp/jump_state.npz",
                 Ma=np.asarray(prev.M_a), Mp=np.asarray(prev.M_p),
                 ama=np.asarray(prev.atoms_a.mass), aea=np.asarray(prev.atoms_a.elem), na=int(prev.atoms_a.n),
                 amp=np.asarray(prev.atoms_p.mass), aep=np.asarray(prev.atoms_p.elem), npp=int(prev.atoms_p.n), it=t)
        Ma2 = np.asarray(state.M_a); Mp2 = np.asarray(state.M_p)
        ia = np.unravel_index(Ma2.argmax(), Ma2.shape); ip = np.unravel_index(Mp2.argmax(), Mp2.shape)
        print("  A argmax", ia, np.asarray(prev.M_a)[ia], "->", Ma2[ia])
        print("  P argmax", ip, np.asarray(prev.M_p)[ip], "->", Mp2[ip])
        break
    if t % 50 == 0 and True:
        print(f"it {t} maxMa {ma:.4g} maxMp {mp:.4g} nA {int(state.atoms_a.n)} nP {int(state.atoms_p.n)} chisq {eng.chisq(state):.5g}")
