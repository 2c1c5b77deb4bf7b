import numpy as np
from cogaps_tpu import CoGAPS

rng = np.random.default_rng(5)
A = rng.gamma(2.0, 2.0, (100, 3)) * (rng.random((100, 3)) < 0.4)
P = rng.gamma(2.0, 2.0, (50, 3)) * (rng.random((50, 3)) < 0.5)
D = (A @ P.T).astype(np.float32)
S = np.where(D > 0, 0.1 * D, 0.1).astype(np.float32)
res = CoGAPS(D, n_patterns=3, n_iterations=600, seed=1, messages=False,
             uncertainty=S, output_frequency=100)
h = res.diagnostics["chisqHistory"]
print("dense+impliedS chisq hist:", h)
print("ratio:", h[-1]/h[0])
