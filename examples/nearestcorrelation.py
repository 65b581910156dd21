"""Nearest correlation matrix in the quantum relative entropy sense.

min y  s.t.  diag(X) = 1,  (y, svec X, svec M) in EpiTrRelEntropyTri
(y >= tr(M log M - M log X)); M a random PSD matrix. Parity:
`examples/nearestcorrelation/JuMP.jl` (cvxquad adaptation).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec_np, svec_length


def build(side: int = 2, seed: int = 1):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((side, side))
    M = M @ M.T
    d = svec_length(side)
    m_vec = smat_to_svec_np(M)

    # vars: (y, x_vec)
    nv = 1 + d
    c = np.zeros(nv)
    c[0] = 1.0

    # diag(X) = 1: diagonal svec slots carry X_ii unscaled
    A = np.zeros((side, nv))
    idx = 0
    for j in range(side):
        idx += j + 1
        A[j, 1 + idx - 1] = 1.0
    b = np.ones(side)

    G = np.zeros((1 + 2 * d, nv))
    G[0, 0] = -1.0
    G[1:1 + d, 1:] = -np.eye(d)
    h = np.concatenate([np.zeros(1 + d), m_vec])
    return Model(c, A, b, G, h, [cones.EpiTrRelEntropyTri(1 + 2 * d)])


MINIMAL = [dict(side=2)]
FAST = [dict(side=5), dict(side=10)]
BENCH = [dict(side=15)]
