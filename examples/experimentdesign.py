"""Experiment design: minimize a convex spectral function of the
information matrix.

min f(V diag(x) V')  s.t.  x >= 0, e'x = k
with f a separable spectral function (trace-inverse = A-optimal design,
negative entropy, ...).
Parity: `examples/experimentdesign/JuMP.jl` (native re-formulation).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec_np, svec_length


_SSF = {
    "inv": cones.InvSSF,
    "entropy": cones.NegEntropySSF,
    "neglog": cones.NegLogSSF,
}


def build(q: int = 3, p: int = 8, k: int = None, ssf: str = "inv",
          seed: int = 1):
    assert p > q
    k = k or 2 * p
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((q, p))

    vec_dim = svec_length(q)
    G_det = np.zeros((vec_dim, p))
    for j in range(p):
        M = -np.outer(V[:, j], V[:, j])
        G_det[:, j] = smat_to_svec_np(M)

    # vars (epi, x)
    n = 1 + p
    c = np.concatenate([[1.0], np.zeros(p)])
    A = np.concatenate([[0.0], np.ones(p)])[None, :]
    b = np.array([float(k)])
    # (epi, 1, svec(V D(x) V')) in matrix sep-spectral cone
    G1 = np.zeros((2 + vec_dim, n))
    G1[0, 0] = -1.0
    G1[2:, 1:] = G_det
    h1 = np.concatenate([[0.0, 1.0], np.zeros(vec_dim)])
    # x >= 0
    G2 = np.hstack([np.zeros((p, 1)), -np.eye(p)])
    h2 = np.zeros(p)
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [
        cones.EpiPerSepSpectralMatrix(_SSF[ssf](), q),
        cones.Nonnegative(p),
    ]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(q=2, p=4), dict(q=2, p=4, ssf="entropy")]
FAST = [dict(q=5, p=15), dict(q=5, p=15, ssf="neglog")]
BENCH = [dict(q=20, p=60)]
