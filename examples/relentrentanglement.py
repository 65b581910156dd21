"""Lower bound on relative entropy of entanglement (PPT relaxation).

min tr(rho log rho - rho log Tau)/log(2)  s.t.  tr(Tau) = 1, PT_B(Tau) PSD

using the quantum relative entropy cone with V = Tau (variable), W = rho
(fixed density matrix).  Parity: `examples/relentrentanglement/JuMP.jl`
(native re-formulation).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import (smat_to_svec_np, svec_to_smat_np,
                                   svec_length)


def _svec(W):
    return smat_to_svec_np(W)


def _smat(v):
    return svec_to_smat_np(v)


def partial_transpose(Q, na, nb):
    """Partial transpose over the second subsystem (`JuMP.jl:41-57`)."""
    Qr = Q.reshape(na, nb, na, nb)
    return np.transpose(Qr, (0, 3, 2, 1)).reshape(na * nb, na * nb)


def build(na: int = 2, nb: int = 2, seed: int = 1):
    side = na * nb
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((side, side))
    Rho = R @ R.T
    Rho = Rho / np.trace(Rho)
    vec_dim = svec_length(side)
    rho_vec = _svec(Rho)

    # vars x = (y, tau_vec)
    n = 1 + vec_dim
    c = np.concatenate([[1.0 / np.log(2.0)], np.zeros(vec_dim)])

    # tr(Tau) = 1
    tr_row = np.concatenate([[0.0], _svec(np.eye(side))])
    A = tr_row[None, :]
    b = np.array([1.0])

    # cone 1: (y, tau_vec, rho_vec) in EpiTrRelEntropyTri
    q1 = 1 + 2 * vec_dim
    G1 = np.zeros((q1, n))
    G1[0, 0] = -1.0
    G1[1:1 + vec_dim, 1:] = -np.eye(vec_dim)
    h1 = np.concatenate([np.zeros(1 + vec_dim), rho_vec])

    # cone 2: svec(PT(Tau)) PSD
    P_pt = np.zeros((vec_dim, vec_dim))
    for j in range(vec_dim):
        e = np.zeros(vec_dim)
        e[j] = 1.0
        P_pt[:, j] = _svec(partial_transpose(_smat(e), na, nb))
    G2 = np.hstack([np.zeros((vec_dim, 1)), -P_pt])
    h2 = np.zeros(vec_dim)

    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [cones.EpiTrRelEntropyTri(q1), cones.PosSemidefTri(vec_dim)]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(na=2, nb=2)]
FAST = [dict(na=2, nb=3)]
BENCH = [dict(na=3, nb=3), dict(na=2, nb=7)]
