import numpy as np
from cogaps_tpu import CoGAPS

# supported regime: exact low-rank, sparse factors, count-scale values
rng = np.random.default_rng(5)
A = rng.gamma(2.0, 2.0, (100, 3)) * (rng.random((100, 3)) < 0.4)
P = rng.gamma(2.0, 2.0, (50, 3)) * (rng.random((50, 3)) < 0.5)
D = (A @ P.T).astype(np.float32)
print("sparsity:", (D == 0).mean(), "mean nnz:", D[D>0].mean(), "max:", D.max(), "min nnz:", D[D>0].min())
res = CoGAPS(D, n_patterns=3, n_iterations=600, seed=1, messages=False,
             sparse_optimization=True, output_frequency=100)
h = res.diagnostics["chisqHistory"]
print("sparse chisq hist:", h)
print("ratio:", h[-1]/h[0])
res2 = CoGAPS(D, n_patterns=3, n_iterations=600, seed=1, messages=False, output_frequency=100)
h2 = res2.diagnostics["chisqHistory"]
print("dense chisq hist:", h2)
print("ratio:", h2[-1]/h2[0])
