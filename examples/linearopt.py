"""Random dense/sparse LP: min c'x s.t. Ax = b, x >= 0.

Parity: `examples/linearopt/native.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(m: int, n: int, nz_frac: float = 1.0, seed: int = 1):
    assert 0 < nz_frac <= 1
    rng = np.random.default_rng(seed)
    A = rng.random((m, n))
    if nz_frac < 1:
        A *= rng.random((m, n)) < nz_frac
    A *= 10
    b = A.sum(axis=1)
    c = rng.random(n)
    G = -np.eye(n)
    h = np.zeros(n)
    return Model(c, A, b, G, h, [cones.Nonnegative(n)])


MINIMAL = [dict(m=4, n=8)]
FAST = [dict(m=15, n=30), dict(m=50, n=100, nz_frac=0.25)]
BENCH = [dict(m=128, n=256), dict(m=256, n=512), dict(m=512, n=1024)]
