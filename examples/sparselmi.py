"""Simple LMI problem over dense-PSD / sparse-PSD / LinMatrixIneq cones.

min y  s.t.  sum(x) = 1,  Q_k + y I + sum_i x_i P_ki psd for k = 1..K
with Q_k negative definite. Parity: `examples/sparselmi/JuMP.jl`
(cholmod/dense sparse-PSD impl distinction collapses to our single
dense-impl PosSemidefTriSparse).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import svec_length

RT2 = np.sqrt(2.0)


def _slot(i, j):
    lo, hi = min(i, j), max(i, j)
    return hi * (hi + 1) // 2 + lo


def _svec_np(S):
    side = S.shape[0]
    out = np.zeros(svec_length(side))
    for j in range(side):
        for i in range(j + 1):
            out[_slot(i, j)] = S[i, j] * (1.0 if i == j else RT2)
    return out


def _rand_symm(side, sparse_Ps, rng):
    if sparse_Ps:
        density = min(3.0 / side, 1.0)
        M = np.where(rng.random((side, side)) < density,
                     rng.standard_normal((side, side)), 0.0)
        for idx in rng.integers(0, side, max(side // 3, 1)):
            M[idx, idx] = rng.random()
        return (M + M.T) / 2
    M = rng.standard_normal((side, side))
    return (M + M.T) / 2


def build(num_lmis: int = 1, side_Ps: int = 3, num_Ps: int = 2,
          sparse_Ps: bool = False, form: str = "psd", seed: int = 1):
    """form: 'psd' | 'linmatrixineq' | 'sparsepsd'."""
    rng = np.random.default_rng(seed)
    Ps = [[_rand_symm(side_Ps, sparse_Ps, rng) for _ in range(num_Ps)]
          for _ in range(num_lmis)]

    def rand_nd():
        M = _rand_symm(side_Ps, sparse_Ps, rng)
        return -(M @ M.T) - 1e-3 * np.eye(side_Ps)

    Qs = [rand_nd() for _ in range(num_lmis)]
    eye = np.eye(side_Ps)

    nv = 1 + num_Ps
    cobj = np.zeros(nv)
    cobj[0] = 1.0
    A = np.zeros((1, nv))
    A[0, 1:] = 1.0
    b = np.array([1.0])

    G_rows, h_rows, cone_list = [], [], []
    for k in range(num_lmis):
        if form == "psd":
            sdim = svec_length(side_Ps)
            G = np.zeros((sdim, nv))
            G[:, 0] = -_svec_np(eye)
            for i in range(num_Ps):
                G[:, 1 + i] = -_svec_np(Ps[k][i])
            G_rows.append(G)
            h_rows.append(_svec_np(Qs[k]))
            cone_list.append(cones.PosSemidefTri(sdim))
        elif form == "sparsepsd":
            # union sparsity pattern of Q, I, and the Ps (lower triangle)
            mask = np.abs(Qs[k]) + eye + sum(np.abs(P) for P in Ps[k]) > 0
            rows, cols = [], []
            for i in range(side_Ps):
                for j in range(i + 1):
                    if mask[i, j]:
                        rows.append(i)
                        cols.append(j)
            rows, cols = np.asarray(rows), np.asarray(cols)
            scale = np.where(rows == cols, 1.0, RT2)
            G = np.zeros((len(rows), nv))
            G[:, 0] = -eye[rows, cols] * scale
            for i in range(num_Ps):
                G[:, 1 + i] = -Ps[k][i][rows, cols] * scale
            G_rows.append(G)
            h_rows.append(Qs[k][rows, cols] * scale)
            cone_list.append(cones.PosSemidefTriSparse(side_Ps, rows, cols))
        elif form == "linmatrixineq":
            # (y, x, 1) with mats [I, P_k1..P_kP, Q_k]
            G = np.zeros((nv + 1, nv))
            G[:nv, :] = -np.eye(nv)
            h = np.zeros(nv + 1)
            h[nv] = 1.0
            G_rows.append(G)
            h_rows.append(h)
            cone_list.append(cones.LinMatrixIneq([eye] + Ps[k] + [Qs[k]]))
        else:
            raise ValueError(form)

    return Model(cobj, A, b, np.vstack(G_rows), np.concatenate(h_rows),
                 cone_list)


MINIMAL = [dict(num_lmis=1, side_Ps=3, num_Ps=2, form="psd"),
           dict(num_lmis=1, side_Ps=3, num_Ps=2, form="linmatrixineq"),
           dict(num_lmis=1, side_Ps=3, num_Ps=2, sparse_Ps=True,
                form="sparsepsd")]
FAST = [dict(num_lmis=2, side_Ps=10, num_Ps=4, form="psd"),
        dict(num_lmis=2, side_Ps=10, num_Ps=4, form="linmatrixineq"),
        dict(num_lmis=2, side_Ps=10, num_Ps=4, sparse_Ps=True,
             form="sparsepsd")]
BENCH = [dict(num_lmis=4, side_Ps=30, num_Ps=8, form="psd")]
