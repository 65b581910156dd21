"""Entanglement-assisted capacity of the amplitude damping channel.

Fawzi & Fawzi "Efficient optimization of the quantum relative entropy",
listing 2 (cvxquad adaptation):
max (cond_epi + qe_epi)/(-log 2)  s.t.  tr(rho)=1, rho psd,
(cond_epi, svec Q2, svec Q1) in EpiTrRelEntropyTri,
(qe_epi, 1, svec Q3) in EpiPerSepSpectralMatrix(NegEntropy),
with Q1 = B rho B', Q2 = I_nb (x) ptr_1(Q1), Q3 = ptr_2(Q1).
Parity: `examples/entanglementassisted/JuMP.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import (smat_to_svec_np, svec_to_smat_np,
                                   svec_length)


def _ptrace(Q, sys, dims):
    """Partial trace over subsystem sys (0 or 1) of Q on H_0 (x) H_1."""
    d0, d1 = dims
    Q4 = Q.reshape(d0, d1, d0, d1)
    if sys == 0:
        return np.einsum("ijik->jk", Q4)
    return np.einsum("ijkj->ik", Q4)


def build(nb: int = 2, ne: int = 2, gamma: float = 0.2):
    ampl_dim = nb * ne
    assert ampl_dim == 4, "amplitude damping channel has output dim 4"
    B = np.array([
        [1.0, 0.0],
        [0.0, np.sqrt(gamma)],
        [0.0, np.sqrt(1.0 - gamma)],
        [0.0, 0.0],
    ])
    sr = svec_length(2)            # rho is 2x2
    sa = svec_length(ampl_dim)
    sb = svec_length(nb)

    # linear maps from svec(rho) to svec(Q1), svec(Q2), svec(Q3)
    M1 = np.zeros((sa, sr))
    M2 = np.zeros((sa, sr))
    M3 = np.zeros((sb, sr))
    for k in range(sr):
        e = np.zeros(sr)
        e[k] = 1.0
        rho_k = svec_to_smat_np(e)
        Q1 = B @ rho_k @ B.T
        Q2 = np.kron(np.eye(nb), _ptrace(Q1, 0, [nb, ne]))
        Q3 = _ptrace(Q1, 1, [nb, ne])
        M1[:, k] = smat_to_svec_np(Q1)
        M2[:, k] = smat_to_svec_np(Q2)
        M3[:, k] = smat_to_svec_np(Q3)

    # vars: (svec rho, cond_epi, qe_epi)
    nv = sr + 2
    c = np.zeros(nv)
    c[sr] = c[sr + 1] = 1.0 / np.log(2.0)   # max (cond+qe)/(-log 2)

    A = np.zeros((1, nv))
    idx = 0
    for j in range(2):
        idx += j + 1
        A[0, idx - 1] = 1.0                 # tr(rho) = 1
    b = np.array([1.0])

    G_rows, h_rows, cone_list = [], [], []
    # rho psd
    G1 = np.zeros((sr, nv))
    G1[:, :sr] = -np.eye(sr)
    G_rows.append(G1)
    h_rows.append(np.zeros(sr))
    cone_list.append(cones.PosSemidefTri(sr))
    # cond_epi >= D(Q1||Q2) = tr(Q1 log Q1 - Q1 log Q2): cone layout is
    # (u, V, W) with u >= tr(W log W - W log V), so V=Q2, W=Q1.  NOTE:
    # the reference example file passes (u, Q1, Q2), which contradicts
    # both cvxquad listing 2 and the reference's own cone definition
    # (`src/Cones/epitrrelentropytri.jl:159`); the ordering here is the
    # correct one (recovers the known capacity ~1.5035 bits at gamma=0.2)
    G2 = np.zeros((1 + 2 * sa, nv))
    G2[0, sr] = -1.0
    G2[1:1 + sa, :sr] = -M2
    G2[1 + sa:, :sr] = -M1
    G_rows.append(G2)
    h_rows.append(np.zeros(1 + 2 * sa))
    cone_list.append(cones.EpiTrRelEntropyTri(1 + 2 * sa))
    # (qe_epi, 1, svec Q3) in EpiPerSepSpectralMatrix(NegEntropy, nb)
    G3 = np.zeros((2 + sb, nv))
    G3[0, sr + 1] = -1.0
    G3[2:, :sr] = -M3
    G_rows.append(G3)
    h3 = np.zeros(2 + sb)
    h3[1] = 1.0
    h_rows.append(h3)
    cone_list.append(cones.EpiPerSepSpectralMatrix(cones.NegEntropySSF(), nb))

    return Model(c, A, b, np.vstack(G_rows), np.concatenate(h_rows),
                 cone_list)


MINIMAL = [dict(nb=2, ne=2)]
FAST = [dict(nb=2, ne=2), dict(nb=4, ne=1)]
BENCH = [dict(nb=2, ne=2)]
