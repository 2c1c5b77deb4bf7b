import numpy as np
from cogaps_tpu import CoGAPS

# scRNA-like counts: Poisson of a low-rank rate, ~high sparsity
rng = np.random.default_rng(5)
A = rng.gamma(1.5, 1.0, (60, 3)) * (rng.random((60, 3)) < 0.4)
P = rng.gamma(1.5, 1.0, (30, 3)) * (rng.random((30, 3)) < 0.5)
rate = A @ P.T
D = rng.poisson(rate).astype(np.float32)
print("sparsity:", (D == 0).mean(), "mean nnz:", D[D>0].mean(), "max:", D.max())
res = CoGAPS(D, n_patterns=3, n_iterations=600, seed=1, messages=False,
             sparse_optimization=True, output_frequency=100)
h = res.diagnostics["chisqHistory"]
print("sparse chisq hist:", h)
print("ratio:", h[-1]/h[0])
