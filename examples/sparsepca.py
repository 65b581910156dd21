"""Sparse PCA (d'Aspremont et al., direct SDP formulation).

max tr(sigma X)  s.t.  tr(X) = 1,  X psd,  ||vec(X)||_1 <= k
(l1 constraint either via the dual EpiNormInf cone or via split
positive/negative parts in the nonnegative cone).
Parity: `examples/sparsepca/native.jl`; noiseless instances have optimal
objective exactly -1.
"""

import numpy as np

from hypatia_tpu import Model, cones

RT2 = np.sqrt(2.0)


def _svec_scales(p):
    """Column-major upper-tri svec scaling vector (1 diag, rt2 off)."""
    out = []
    for j in range(p):
        for i in range(j + 1):
            out.append(1.0 if i == j else RT2)
    return np.asarray(out)


def _smat_to_svec_np(S):
    p = S.shape[0]
    out = []
    for j in range(p):
        for i in range(j + 1):
            out.append(S[i, j] if i == j else RT2 * S[i, j])
    return np.asarray(out)


def build(p: int = 3, k: int = 2, use_epinorminfdual: bool = True,
          noise_ratio: float = 0.0, seed: int = 1):
    assert 0 < k <= p
    rng = np.random.default_rng(seed)
    signal_idxs = rng.choice(p, size=k, replace=False)
    if noise_ratio <= 0:
        x = np.zeros(p)
        x[signal_idxs] = rng.random(k)
        sigma = np.outer(x, x)
        sigma /= np.trace(sigma)
    else:
        x = rng.standard_normal((p, 100))
        sigma = x @ x.T
        y = noise_ratio * rng.standard_normal(k)
        sigma[np.ix_(signal_idxs, signal_idxs)] += np.outer(y, y)
        sigma /= 100.0

    dimx = p * (p + 1) // 2
    c = -_smat_to_svec_np(sigma)
    b = np.array([1.0])
    A = np.zeros((1, dimx))
    idx = 0
    for j in range(p):
        idx += j + 1
        A[0, idx - 1] = 1.0  # diagonal slot of column j
    scales = _svec_scales(p)
    cone_list = [cones.PosSemidefTri(dimx)]

    if use_epinorminfdual:
        # l1-ball via dual infinity-norm cone on rt2-rescaled coords
        # (svec off-diagonals already carry one rt2; a second gives the
        # factor 2 in sum_{i != j} |X_ij|)
        G = np.vstack([
            -np.eye(dimx),
            np.zeros((1, dimx)),
            np.diag(-scales),
        ])
        h = np.concatenate([np.zeros(dimx), [float(k)], np.zeros(dimx)])
        cone_list.append(cones.EpiNormInf(1 + dimx, use_dual=True))
    else:
        # split |x| <= xp + xn with svec-scaled l1 sum bounded by k
        l1 = scales
        nv = 3 * dimx
        G = np.zeros((3 * dimx + 1, nv))
        G[:dimx, :dimx] = -np.eye(dimx)
        G[dimx:3 * dimx, dimx:] = -np.eye(2 * dimx)
        G[3 * dimx, dimx:2 * dimx] = l1
        G[3 * dimx, 2 * dimx:] = l1
        A2 = np.zeros((1 + dimx, nv))
        A2[0, :dimx] = A[0]
        A2[1:, :dimx] = -np.eye(dimx)
        A2[1:, dimx:2 * dimx] = -np.eye(dimx)
        A2[1:, 2 * dimx:] = np.eye(dimx)
        c = np.concatenate([c, np.zeros(2 * dimx)])
        b = np.concatenate([b, np.zeros(dimx)])
        h = np.concatenate([np.zeros(3 * dimx), [float(k)]])
        A = A2
        cone_list.append(cones.Nonnegative(2 * dimx + 1))

    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(p=3, k=2, use_epinorminfdual=True),
           dict(p=3, k=2, use_epinorminfdual=False),
           dict(p=3, k=2, use_epinorminfdual=True, noise_ratio=10.0)]
FAST = [dict(p=5, k=3, use_epinorminfdual=True),
        dict(p=5, k=3, use_epinorminfdual=False, noise_ratio=10.0),
        dict(p=30, k=10, use_epinorminfdual=True)]
BENCH = [dict(p=40, k=12, use_epinorminfdual=True, noise_ratio=10.0)]
