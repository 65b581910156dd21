"""Nonlinear matrix inequality Y - X X' psd (Ben-Tal & Nemirovski p.154).

max tr(C X)  s.t.  Y_ij = P_ij on a pattern,  Y - X X' psd — via the
MatrixEpiPerSquare cone (U=Y, v=1/2, W=X) or the Schur-complement PSD
lift [I X'; X Y]. Parity: `examples/matrixquadratic/JuMP.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import svec_length

RT2 = np.sqrt(2.0)


def _slot(i, j):
    lo, hi = min(i, j), max(i, j)
    return hi * (hi + 1) // 2 + lo


def build(num_rows: int = 2, num_cols: int = 2,
          use_matrixepipersquare: bool = True, seed: int = 1):
    n, m = num_rows, num_cols
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((m, n))
    P = rng.standard_normal((n, n))
    P = P @ P.T
    # random lower-tri fixing pattern including the diagonal
    pat = [(i, i) for i in range(n)]
    for i in range(1, n):
        for j in range(i):
            if rng.random() < 1.0 / np.sqrt(n):
                pat.append((i, j))

    sn = svec_length(n)
    nm = n * m
    nv = nm + sn          # vars: (vec X col-major, svec Y)

    c = np.zeros(nv)
    for j in range(m):
        for i in range(n):
            c[j * n + i] = -C[j, i]   # max tr(C X)

    A = np.zeros((len(pat), nv))
    b = np.zeros(len(pat))
    for r, (i, j) in enumerate(pat):
        A[r, nm + _slot(i, j)] = 1.0
        b[r] = P[i, j] * (1.0 if i == j else RT2)

    if use_matrixepipersquare:
        # cone point (svec Y, 1/2, vec X)
        q = sn + 1 + nm
        G = np.zeros((q, nv))
        G[:sn, nm:] = -np.eye(sn)
        G[sn + 1:, :nm] = -np.eye(nm)
        h = np.zeros(q)
        h[sn] = 0.5
        cone_list = [cones.MatrixEpiPerSquare(n, m)]
    else:
        # svec of [[I_m, X'], [X, Y]], side m+n
        big = svec_length(m + n)
        G = np.zeros((big, nv))
        h = np.zeros(big)
        for j in range(m):
            h[_slot(j, j)] = 1.0
        for i in range(n):
            for j in range(m):
                G[_slot(m + i, j), j * n + i] = -RT2
        for i in range(n):
            for j in range(i + 1):
                G[_slot(m + i, m + j), nm + _slot(i, j)] = -1.0
        cone_list = [cones.PosSemidefTri(big)]

    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(num_rows=2, num_cols=2, use_matrixepipersquare=True),
           dict(num_rows=2, num_cols=2, use_matrixepipersquare=False)]
FAST = [dict(num_rows=5, num_cols=6, use_matrixepipersquare=True),
        dict(num_rows=5, num_cols=6, use_matrixepipersquare=False),
        dict(num_rows=10, num_cols=20, use_matrixepipersquare=True)]
BENCH = [dict(num_rows=20, num_cols=40, use_matrixepipersquare=True)]
