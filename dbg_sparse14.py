import numpy as np, jax, jax.numpy as jnp
from cogaps_tpu.models import sparse

z = np.load("/tmp/jump_state.npz")
rng = np.random.default_rng(5)
A = rng.gamma(2.0, 2.0, (100, 3)) * (rng.random((100, 3)) < 0.4)
P = rng.gamma(2.0, 2.0, (50, 3)) * (rng.random((50, 3)) < 0.5)
D = (A @ P.T).astype(np.float32)

Ma, Mp = z["Ma"], z["Mp"]
# P-sampler: rows = samples, data = D.T, other = Ma
ellp = sparse.to_ell(D.T)
phase = sparse.make_sparse_phase(jnp.asarray(Ma))
model = sparse.make_model(ellp, phase)
B = 3  # evaluate at (42,0) for all k
r1 = jnp.asarray([42,42,42], jnp.int32); c1 = jnp.asarray([0,1,2], jnp.int32)
ab = model.alpha((), jnp.asarray(Mp), r1, c1, r1, c1)
print("fp32 smu:", np.asarray(ab.smu1), "s:", np.asarray(ab.s1), "err floor:", np.asarray(ab.err1))

# fp64 truth
D64 = D.T.astype(np.float64); M64 = Mp.astype(np.float64); o64 = Ma.astype(np.float64)
S64 = np.where(D64 > 0, 0.1*D64, 0.1)
iv = 1.0/(S64*S64)
ap = M64 @ o64.T
res = D64 - ap
for c in range(3):
    s = (o64[:, c]**2 * iv[42]).sum(); smu = (o64[:, c]*res[42]*iv[42]).sum()
    print(f"c={c} true s {s:.6g} smu {smu:.6g} gibbs mean {(smu)/s:.6g}")
print("Mp[42]:", Mp[42], " D.T[42] nnz count:", (D.T[42]>0).sum())
print("max Ma col:", Ma.max(axis=0))
