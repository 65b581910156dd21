"""Signomial minimization via the SAGE relative-entropy relaxation.

max gamma  s.t.  c - gamma*e_const in C_SAGE(A), certified per-term by
relative entropy cones (Murray-Chandrasekaran-Wierman 2019):
    d = sum_k C_k;  (A_notk - 1 A_k)' V_k = 0;
    (C_kk + sum V_k, C_k_notk, V_k) in EpiRelEntropy.
Parity: `examples/signomialmin/JuMP.jl` (unconstrained case, native
re-formulation).
"""

import numpy as np

from hypatia_tpu import Model, cones


def _random_signomial(m, n, rng):
    A = np.vstack([np.zeros((1, n)), rng.standard_normal((m - 1, n))])
    c = np.concatenate([[rng.random()],
                        rng.random(m - 1)])  # positive non-constant terms
    return c, A


def build(m: int = 3, n: int = 1, seed: int = 1, c=None, A=None):
    rng = np.random.default_rng(seed)
    if c is None:
        c, A = _random_signomial(m, n, rng)
    c = np.asarray(c, dtype=float)
    A = np.asarray(A, dtype=float)
    m, n = A.shape
    const_row = int(np.argmax(np.all(A == 0, axis=1)))

    # vars: gamma, C (m x m row-major), V (m x (m-1) row-major)
    nC = m * m
    nV = m * (m - 1)
    nv = 1 + nC + nV
    iC = lambda k, i: 1 + k * m + i
    iV = lambda k, j: 1 + nC + k * (m - 1) + j

    c_obj = np.zeros(nv)
    c_obj[0] = -1.0  # max gamma

    A_rows, b_rows = [], []
    # d_i = sum_k C_{k,i} with d = c - gamma e_const
    for i in range(m):
        row = np.zeros(nv)
        for k in range(m):
            row[iC(k, i)] = 1.0
        if i == const_row:
            row[0] = 1.0
        A_rows.append(row)
        b_rows.append(c[i])
    # per-k orthogonality: (A_notk - 1 A_k)' V_k = 0
    for k in range(m):
        notk = [i for i in range(m) if i != k]
        M = A[notk, :] - A[k][None, :]
        for col in range(n):
            row = np.zeros(nv)
            for j, i in enumerate(notk):
                row[iV(k, j)] = M[j, col]
            A_rows.append(row)
            b_rows.append(0.0)

    G_rows, h_rows, cone_list = [], [], []
    for k in range(m):
        notk = [i for i in range(m) if i != k]
        dim = 1 + 2 * (m - 1)
        Gk = np.zeros((dim, nv))
        # u = C_kk + sum V_k
        Gk[0, iC(k, k)] = -1.0
        for j in range(m - 1):
            Gk[0, iV(k, j)] = -1.0
        # v = C_{k, notk}
        for j, i in enumerate(notk):
            Gk[1 + j, iC(k, i)] = -1.0
        # w = V_k
        for j in range(m - 1):
            Gk[m + j, iV(k, j)] = -1.0
        G_rows.append(Gk)
        h_rows.append(np.zeros(dim))
        cone_list.append(cones.EpiRelEntropy(dim))

    Amat = np.vstack(A_rows)
    b = np.asarray(b_rows)
    G = np.vstack(G_rows)
    h = np.concatenate(h_rows)
    return Model(c_obj, Amat, b, G, h, cone_list)


MINIMAL = [dict(c=[1.0, 1.0, 1.0], A=[[0.0], [1.0], [-1.0]])]  # min = 3
FAST = [dict(m=6, n=2)]
BENCH = [dict(m=20, n=6)]
