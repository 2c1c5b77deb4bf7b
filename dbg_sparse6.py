import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.sparse_engine import SparseGapsEngine
from cogaps_tpu.engine import EQUILIBRATION
from cogaps_tpu.models import dense, sparse

rng = np.random.default_rng(5)
A = rng.gamma(2.0, 1.0, (30, 3)) * (rng.random((30, 3)) < 0.5)
P = rng.gamma(2.0, 1.0, (20, 3)) * (rng.random((20, 3)) < 0.5)
D = (A @ P.T).astype(np.float32) * 10.0

cfg = CogapsParams(n_patterns=3, n_iterations=300, seed=1).engine_config(30, 20)
eng = SparseGapsEngine(D, cfg)
state = eng.init_state(); stats = eng.init_stats()
key = jax.random.PRNGKey(1)

def drift(atoms, M, k):
    mass = np.asarray(atoms.mass); elem = np.asarray(atoms.elem)
    n = int(atoms.n)
    Mre = np.zeros(M.size, np.float64)
    for i in range(len(elem)):
        if elem[i] >= 0 and mass[i] > 0:
            Mre[elem[i]] += mass[i]
    return np.abs(Mre.reshape(M.shape) - np.asarray(M)).max()

for t in range(0, 60, 10):
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, t, t + 10)
    da = drift(state.atoms_a, state.M_a, 3)
    dp = drift(state.atoms_p, state.M_p, 3)
    print(f"it {t+10} driftA {da:.4g} driftP {dp:.4g} maxMa {np.asarray(state.M_a).max():.4g} maxMp {np.asarray(state.M_p).max():.4g}")

# alpha equivalence at the current (possibly diverged) state, for the A side
D10 = D
M = state.M_a; other = state.M_p
S = np.where(D10 > 0, 0.1 * D10, 0.1).astype(np.float32)
invS2 = jnp.asarray(1.0 / (S * S))
ap = M @ other.T
R = (jnp.asarray(D10) - ap) * invS2
dphase = dense.make_phase(invS2, other)
B = 256
r = np.random.default_rng(0)
r1 = jnp.asarray(r.integers(0, 30, B), jnp.int32); c1 = jnp.asarray(r.integers(0, 3, B), jnp.int32)
r2 = jnp.asarray(r.integers(0, 30, B), jnp.int32); c2 = jnp.asarray(r.integers(0, 3, B), jnp.int32)
r2 = r2.at[:64].set(r1[:64])
d_ab = dense.alpha_batch(dense.DenseCache(R), dphase, invS2, r1, c1, r2, c2)
smodel = sparse.make_model(sparse.to_ell(D10), sparse.make_sparse_phase(other))
s_ab = smodel.alpha((), M, r1, c1, r2, c2)
for f in ["s1", "smu1", "s_pair", "smu_pair"]:
    a = np.asarray(getattr(s_ab, f)); b = np.asarray(getattr(d_ab, f))
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1)
    print(f, "max rel err:", rel.max(), " val range:", b.min(), b.max())
