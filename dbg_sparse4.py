import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.sparse_engine import SparseGapsEngine
from cogaps_tpu.engine import EQUILIBRATION

rng = np.random.default_rng(5)
A = rng.gamma(2.0, 1.0, (30, 3)) * (rng.random((30, 3)) < 0.5)
P = rng.gamma(2.0, 1.0, (20, 3)) * (rng.random((20, 3)) < 0.5)
D = (A @ P.T).astype(np.float32) * 10.0

cfg = CogapsParams(n_patterns=3, n_iterations=300, seed=1).engine_config(30, 20)
eng = SparseGapsEngine(D, cfg)
print("lam_a", eng.lam_a, "lam_p", eng.lam_p, "maxmass/lam", cfg.max_gibbs_mass_a / eng.lam_a)
state = eng.init_state(); stats = eng.init_stats()
key = jax.random.PRNGKey(1)
for t in range(0, 300, 10):
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, t, t + 10)
    ma, mp = np.asarray(state.M_a), np.asarray(state.M_p)
    print(f"it {t+10:4d} maxMa {ma.max():.3e} maxMp {mp.max():.3e} "
          f"minMa {ma.min():.3e} minMp {mp.min():.3e} "
          f"nA {int(state.atoms_a.n)} nP {int(state.atoms_p.n)} chisq {eng.chisq(state):.4g}")
    if ma.max() > 1e6: break
