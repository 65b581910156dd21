"""Capacity of a classical-quantum channel.

max sum rho_i H(P_i) - epi  s.t.  rho in simplex,
    (epi, 1, sum_i rho_i svec(P_i)) in matrix negative-entropy cone
(Fawzi & Fawzi, "Efficient optimization of the quantum relative entropy").
Parity: `examples/classicalquantum/JuMP.jl` (native re-formulation).
"""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec, herm_to_svec, svec_length


def build(d: int = 3, is_complex: bool = False, seed: int = 1):
    rng = np.random.default_rng(seed)

    def density():
        if is_complex:
            P = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        else:
            P = rng.standard_normal((d, d))
        P = P @ P.conj().T
        return P / np.trace(P).real

    Ps = [density() for _ in range(d)]
    Hs = [float(np.real(np.trace(P @ scipy.linalg.logm(P)))) for P in Ps]
    svec = herm_to_svec if is_complex else smat_to_svec
    P_vecs = [np.asarray(svec(jnp.asarray(P))) for P in Ps]
    vec_dim = P_vecs[0].size

    # vars (epi, rho)
    n = 1 + d
    c = np.concatenate([[1.0], -np.asarray(Hs)])  # min epi - rho'H
    A = np.concatenate([[0.0], np.ones(d)])[None, :]
    b = np.array([1.0])
    # cone 1: (epi, 1, sum rho_i P_vec_i) in matrix entropy cone
    G1 = np.zeros((2 + vec_dim, n))
    G1[0, 0] = -1.0
    for i in range(d):
        G1[2:, 1 + i] = -P_vecs[i]
    h1 = np.concatenate([[0.0, 1.0], np.zeros(vec_dim)])
    # rho >= 0
    G2 = np.hstack([np.zeros((d, 1)), -np.eye(d)])
    h2 = np.zeros(d)
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [
        cones.EpiPerSepSpectralMatrix(cones.NegEntropySSF(), d,
                                      is_complex=is_complex),
        cones.Nonnegative(d),
    ]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(d=3), dict(d=2, is_complex=True)]
FAST = [dict(d=6)]
BENCH = [dict(d=16)]
