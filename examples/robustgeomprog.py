"""Robust geometric programming (Chandrasekaran & Shah 2017, sec 4.4).

f(C, B) = -inf { d(v, e*c) : B'v = 0, c in C } with d the vector
relative entropy; C = { c : ||1 - c||_1 <= sqrt(k)/2 }.
Parity: `examples/robustgeomprog/JuMP.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(n: int = 2, k: int = 3, seed: int = 1):
    assert n < k
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((k, n))

    # vars: (t, c (k), v (k))
    nv = 1 + 2 * k
    cobj = np.zeros(nv)
    cobj[0] = 1.0

    A = np.zeros((n, nv))
    A[:, 1 + k:] = B.T
    b = np.zeros(n)

    G_rows, h_rows, cone_list = [], [], []
    # (t, e*c, v) in EpiRelEntropy(1 + 2k): t >= sum v_i log(v_i/(e c_i))
    G1 = np.zeros((1 + 2 * k, nv))
    G1[0, 0] = -1.0
    G1[1:1 + k, 1:1 + k] = -np.e * np.eye(k)
    G1[1 + k:, 1 + k:] = -np.eye(k)
    G_rows.append(G1)
    h_rows.append(np.zeros(1 + 2 * k))
    cone_list.append(cones.EpiRelEntropy(1 + 2 * k))
    # (sqrt(k)/2, 1 - c) in the l1-norm cone (dual EpiNormInf)
    G2 = np.zeros((1 + k, nv))
    G2[1:, 1:1 + k] = np.eye(k)
    h2 = np.concatenate([[np.sqrt(k) / 2], np.ones(k)])
    G_rows.append(G2)
    h_rows.append(h2)
    cone_list.append(cones.EpiNormInf(1 + k, use_dual=True))

    return Model(cobj, A, b, np.vstack(G_rows), np.concatenate(h_rows),
                 cone_list)


MINIMAL = [dict(n=2, k=3)]
# larger instances have the optimal v on the cone boundary (v = 0) and
# need relaxed tolerances, as in the reference (every robustgeomprog
# fast instance is marked relaxed_tols in `JuMP_test.jl`)
FAST = [dict(n=5, k=10)]
BENCH = [dict(n=100, k=150)]
