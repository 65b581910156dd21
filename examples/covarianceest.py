"""Covariance estimation with a matrix spectral regularizer.

min tr(P log P)-type spectral objective  s.t.  tr(P) = d, linear prior
equalities/inequalities on svec(P).
Parity: `examples/covarianceest/JuMP.jl` (native re-formulation with the
matrix negative-entropy separable spectral cone).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec_np, svec_length


def build(d: int, seed: int = 1):
    assert d >= 2
    rng = np.random.default_rng(seed)
    P0 = rng.standard_normal((d, d))
    P0 = P0 @ P0.T + 0.5 * np.eye(d)
    P0 *= d / np.trace(P0)
    vec_dim = svec_length(d)
    P0_vec = smat_to_svec_np(P0)
    tr_vec = smat_to_svec_np(np.eye(d))

    # vars (epi, svec P)
    n = 1 + vec_dim
    c = np.concatenate([[1.0], np.zeros(vec_dim)])
    lin_dim = max(1, round(np.sqrt(d - 1)))
    B = rng.standard_normal((lin_dim, vec_dim))
    bb = B @ P0_vec
    A = np.vstack([
        np.concatenate([[0.0], tr_vec])[None, :],
        np.hstack([np.zeros((lin_dim, 1)), B]),
    ])
    b = np.concatenate([[float(d)], bb])

    C = rng.standard_normal((lin_dim, vec_dim))
    cc = C @ P0_vec

    # cone 1: (epi, 1, svec P) in matrix neg-entropy cone
    G1 = np.zeros((2 + vec_dim, n))
    G1[0, 0] = -1.0
    G1[2:, 1:] = -np.eye(vec_dim)
    h1 = np.concatenate([[0.0, 1.0], np.zeros(vec_dim)])
    # cone 2: cc - C svecP >= 0
    G2 = np.hstack([np.zeros((lin_dim, 1)), C])
    h2 = cc
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [
        cones.EpiPerSepSpectralMatrix(cones.NegEntropySSF(), d),
        cones.Nonnegative(lin_dim),
    ]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(d=3)]
FAST = [dict(d=8)]
BENCH = [dict(d=40)]
