"""Lyapunov stability analysis (problem 2 of the reference example).

min t  s.t.  P - I PSD,
    [-A'P - PA - alpha P - t gamma^2 I,  -P;  -P,  t I] PSD
Parity: `examples/lyapunovstability/JuMP.jl` (linear_dynamics=false, PSD
formulation, native re-formulation).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec_np, svec_length


def _svec(W):
    return smat_to_svec_np(W)


def build(num_rows: int = 3, seed: int = 1):
    rng = np.random.default_rng(seed)
    m = num_rows
    A = rng.standard_normal((m, m))
    A = -A @ A.T - np.eye(m)
    alpha, gamma = 0.01, 0.01

    # vars (t, svec P)
    pv = svec_length(m)
    n = 1 + pv
    c = np.zeros(n)
    c[0] = 1.0

    # cone 1: P - I PSD
    G1 = np.hstack([np.zeros((pv, 1)), -np.eye(pv)])
    h1 = _svec(-np.eye(m))
    # cone 2: the 2m x 2m block matrix PSD; build svec rows linear in (t, P)
    big = svec_length(2 * m)
    G2 = np.zeros((big, n))
    h2 = np.zeros(big)

    def block_svec(T11, T12, T22):
        M = np.zeros((2 * m, 2 * m))
        M[:m, :m] = T11
        M[:m, m:] = T12
        M[m:, :m] = T12.T
        M[m:, m:] = T22
        return _svec(M)

    # coefficient of t
    G2[:, 0] = -block_svec(-gamma**2 * np.eye(m), np.zeros((m, m)), np.eye(m))
    # coefficients of P entries: for each svec basis element E of P:
    # T11 = -A'E - EA - alpha E, T12 = -E
    from hypatia_tpu.ops.svec import svec_to_smat_np

    for j in range(pv):
        e = np.zeros(pv)
        e[j] = 1.0
        E = svec_to_smat_np(e)
        T11 = -A.T @ E - E @ A - alpha * E
        G2[:, 1 + j] = -block_svec(T11, -E, np.zeros((m, m)))

    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [cones.PosSemidefTri(pv), cones.PosSemidefTri(big)]
    return Model(c, np.zeros((0, n)), np.zeros(0), G, h, cone_list)


MINIMAL = [dict(num_rows=2)]
FAST = [dict(num_rows=5)]
BENCH = [dict(num_rows=20)]
