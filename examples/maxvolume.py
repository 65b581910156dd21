"""Maximum-volume axis-parallel hypercube inside a polyhedron.

max geomean(x)  s.t.  poly_hrep x <= 1  (natural hypogeomean formulation).
Parity: `examples/maxvolume/native.jl` (use_hypogeomean variant; the power /
epipersquare extended formulations exist in the reference as extended-
formulation comparisons).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(n: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    poly = np.eye(n) + rng.standard_normal((n, n)) / n
    # vars (t, x)
    c = np.concatenate([[-1.0], np.zeros(n)])
    A = np.zeros((0, 1 + n))
    b = np.zeros(0)
    # geomean cone (t, x) and polyhedron rows 1 - poly x >= 0
    G1 = -np.eye(1 + n)
    h1 = np.zeros(1 + n)
    G2 = np.hstack([np.zeros((n, 1)), poly])
    h2 = np.ones(n)
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    return Model(c, A, b, G, h,
                 [cones.HypoGeoMean(1 + n), cones.Nonnegative(n)])


MINIMAL = [dict(n=3)]
FAST = [dict(n=12)]
BENCH = [dict(n=100), dict(n=300)]
