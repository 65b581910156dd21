"""Minimize the condition number of a matrix pencil subject to an LMI.

min gamma  s.t.  nu >= 0,
    nu F0 + sum y_i F_i  PSD
    nu M0 + sum y_i M_i - I  PSD
    gamma I - nu M0 - sum y_i M_i  PSD
(change of variables nu = 1/mu, y = x/mu; Boyd et al. LMI book §3.2).
Parity: `examples/conditionnum/JuMP.jl` (use_linmatrixineq variant, native
re-formulation with LinMatrixIneq cones).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(side: int = 3, len_y: int = 2, seed: int = 1):
    rng = np.random.default_rng(seed)

    def rand_pd():
        Mh = rng.standard_normal((side, side))
        return Mh @ Mh.T

    Mi = [rand_pd() for _ in range(len_y)]
    M0 = rand_pd()
    Fi = [rand_pd() if (rng.random() > 0.5 or i < 2)
          else _sym(rng, side) for i in range(len_y)]
    F0 = rand_pd() + np.eye(side)
    eye = np.eye(side)

    # vars (gamma, nu, y)
    n = 2 + len_y
    c = np.zeros(n)
    c[0] = 1.0
    G_rows, h_rows, cone_list = [], [], []
    # nu >= 0
    Gn = np.zeros((1, n))
    Gn[0, 1] = -1.0
    G_rows.append(Gn)
    h_rows.append(np.zeros(1))
    cone_list.append(cones.Nonnegative(1))
    # (nu, y) in LMI([F0, Fi...])
    G1 = np.zeros((1 + len_y, n))
    G1[0, 1] = -1.0
    G1[1:, 2:] = -np.eye(len_y)
    G_rows.append(G1)
    h_rows.append(np.zeros(1 + len_y))
    cone_list.append(cones.LinMatrixIneq([F0] + Fi))
    # (-1, nu, y) in LMI([I, M0, Mi...]) -> first coord fixed at -1
    G2 = np.zeros((2 + len_y, n))
    G2[1, 1] = -1.0
    G2[2:, 2:] = -np.eye(len_y)
    h2 = np.zeros(2 + len_y)
    h2[0] = -1.0
    G_rows.append(G2)
    h_rows.append(h2)
    cone_list.append(cones.LinMatrixIneq([eye, M0] + Mi))
    # (gamma, -nu, -y) in LMI([I, M0, Mi...])
    G3 = np.zeros((2 + len_y, n))
    G3[0, 0] = -1.0
    G3[1, 1] = 1.0
    G3[2:, 2:] = np.eye(len_y)
    G_rows.append(G3)
    h_rows.append(np.zeros(2 + len_y))
    cone_list.append(cones.LinMatrixIneq([eye, M0] + Mi))

    G = np.vstack(G_rows)
    h = np.concatenate(h_rows)
    return Model(c, np.zeros((0, n)), np.zeros(0), G, h, cone_list)


def _sym(rng, side):
    M = rng.standard_normal((side, side))
    return (M + M.T) / 2


MINIMAL = [dict(side=3, len_y=2)]
FAST = [dict(side=6, len_y=4)]
BENCH = [dict(side=25, len_y=10)]
