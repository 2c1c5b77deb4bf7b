import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.params import CogapsParams
from cogaps_tpu.engine import GapsEngine, EQUILIBRATION
from cogaps_tpu.models import sparse

rng = np.random.default_rng(5)
A = rng.gamma(2.0, 2.0, (100, 3)) * (rng.random((100, 3)) < 0.4)
P = rng.gamma(2.0, 2.0, (50, 3)) * (rng.random((50, 3)) < 0.5)
D = (A @ P.T).astype(np.float32)
S = np.where(D > 0, 0.1 * D, 0.1).astype(np.float32)

cfg = CogapsParams(n_patterns=3, n_iterations=600, seed=1).engine_config(100, 50)
eng = GapsEngine(D, S, cfg)
state = eng.init_state(); stats = eng.init_stats()
key = jax.random.PRNGKey(1)

def exact_alpha(D, M, other, r, c):
    # float64 ground truth, single-element
    D64 = D.astype(np.float64); M64 = np.asarray(M, np.float64); o64 = np.asarray(other, np.float64)
    S64 = np.where(D64 > 0, 0.1 * D64, 0.1)
    ap = M64 @ o64.T
    res = D64 - ap
    iv = 1.0 / (S64 * S64)
    s = (o64[:, c].T ** 2 * iv[r]).sum(-1) if False else np.array([ (o64[:, cc]**2 * iv[rr]).sum() for rr, cc in zip(r, c) ])
    smu = np.array([ (o64[:, cc] * res[rr] * iv[rr]).sum() for rr, cc in zip(r, c) ])
    return s, smu

for ckpt in (10, 50):
    state, stats = eng.run_span(state, stats, key, EQUILIBRATION, ckpt - 10 if ckpt == 10 else 10, ckpt)
    M = state.M_a; other = state.M_p
    print(f"--- it {ckpt}: maxMa {np.asarray(M).max():.4g} maxMp {np.asarray(other).max():.4g}")
    B = 512
    r = np.random.default_rng(0)
    r1 = r.integers(0, 100, B).astype(np.int32); c1 = r.integers(0, 3, B).astype(np.int32)
    smodel = sparse.make_model(sparse.to_ell(D), sparse.make_sparse_phase(other))
    ab = smodel.alpha((), M, jnp.asarray(r1), jnp.asarray(c1), jnp.asarray(r1), jnp.asarray(c1))
    es, esmu = exact_alpha(D, M, other, r1, c1)
    s32 = np.asarray(ab.s1, np.float64); smu32 = np.asarray(ab.smu1, np.float64)
    serr = np.abs(s32 - es) / np.maximum(np.abs(es), 1e-3)
    smuerr = np.abs(smu32 - esmu) / np.maximum(np.abs(esmu), 1e-3)
    i = smuerr.argmax()
    print("s rel err max", serr.max(), "| smu rel err max", smuerr.max())
    print("worst smu:", "got", smu32[i], "want", esmu[i], "s", es[i], "gibbs mean want", esmu[i]/es[i], "got", smu32[i]/s32[i])
