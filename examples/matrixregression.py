"""Regularized matrix regression.

min 1/(2n) ||Y - X A||_fro^2 + lam_nuc ||A||_nuc (+ lam_fro ||A||_fro)
Parity: `examples/matrixregression/native.jl` (nuclear + frobenius
penalties; lasso/group-lasso variants not ported).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(n: int = 5, p: int = 3, m: int = 4, lam_nuc: float = 0.1,
          lam_fro: float = 0.0, A_rank: int = 2, seed: int = 1):
    rng = np.random.default_rng(seed)
    A_true = (rng.standard_normal((p, A_rank))
              @ rng.standard_normal((A_rank, m)))
    X = rng.standard_normal((n, p))
    Y = X @ A_true + 0.1 * rng.standard_normal((n, m))

    pm = p * m
    nm = n * m
    # vars (t_loss, t_nuc, t_fro, vec A (col-major))
    nv = 3 + pm
    c = np.concatenate([[1.0, lam_nuc, lam_fro], np.zeros(pm)])

    G_rows, h_rows, cone_list = [], [], []
    # loss: (t_loss, 1, vec(Y - X A)/sqrt(n)) in EpiPerSquare
    G1 = np.zeros((2 + nm, nv))
    G1[0, 0] = -1.0
    # vec(X A): column j of A affects column j of XA
    for j in range(m):
        for k in range(p):
            G1[2 + j * n:2 + (j + 1) * n, 3 + j * p + k] = \
                X[:, k] / np.sqrt(n)
    h1 = np.concatenate([[0.0, 1.0], Y.T.reshape(-1) / np.sqrt(n)])
    G_rows.append(G1)
    h_rows.append(h1)
    cone_list.append(cones.EpiPerSquare(2 + nm))

    # nuclear norm: (t_nuc, vec A) with A (min(p,m) x max(p,m))
    d1, d2 = min(p, m), max(p, m)
    G2 = np.zeros((1 + pm, nv))
    G2[0, 1] = -1.0
    # vec convention of EpiNormSpectral: column-major of (d1 x d2); our A is
    # p x m; if p <= m use A directly else use A'
    for j in range(m):
        for k in range(p):
            if p <= m:
                idx = j * p + k        # A[k, j] at col-major (p x m)
            else:
                idx = k * m + j        # A'[j, k] at col-major (m x p)
            G2[1 + idx, 3 + j * p + k] = -1.0
    G_rows.append(G2)
    h_rows.append(np.zeros(1 + pm))
    cone_list.append(cones.EpiNormSpectral(d1, d2, use_dual=True))

    # frobenius norm: (t_fro, vec A) in EpiNormEucl
    G3 = np.zeros((1 + pm, nv))
    G3[0, 2] = -1.0
    G3[1:, 3:] = -np.eye(pm)
    G_rows.append(G3)
    h_rows.append(np.zeros(1 + pm))
    cone_list.append(cones.EpiNormEucl(1 + pm))

    G = np.vstack(G_rows)
    h = np.concatenate(h_rows)
    return Model(c, np.zeros((0, nv)), np.zeros(0), G, h, cone_list)


MINIMAL = [dict(n=4, p=2, m=3)]
FAST = [dict(n=10, p=5, m=8, lam_fro=0.05)]
BENCH = [dict(n=100, p=30, m=50)]
