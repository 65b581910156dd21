"""Nearest polynomial matrix: maximize the weighted volume of Q such
that H - Q is SOS-PSD on the unit box, H a random polynomial matrix.

Formulations: WSOS-PSD matrix cone, or scalar WSOS with the y-probe
kron lift. Parity: `examples/nearestpolymat/JuMP.jl` (the explicit
Gram-matrix SDP formulation is not ported).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate

RT2 = np.sqrt(2.0)


def _blk(i, j):
    lo, hi = min(i, j), max(i, j)
    return hi * (hi + 1) // 2 + lo


def build(n: int = 1, halfdeg: int = 1, R: int = 1, use_wsos: bool = False,
          seed: int = 1):
    rng = np.random.default_rng(seed)
    dom = BoxDomain(-np.ones(n), np.ones(n))
    U, pts, Ps, V, w = interpolate(dom, halfdeg, calc_V=True,
                                   get_quadr=True, seed=seed)
    V = np.asarray(V)
    w = np.asarray(w)
    sdim = R * (R + 1) // 2
    H = {}
    for j in range(R):
        for i in range(j + 1):
            H[(i, j)] = V @ rng.integers(-9, 10, size=U).astype(float)

    nv = U * sdim     # q_poly, svec-block-ordered (column-major upper)
    c = np.zeros(nv)
    for j in range(R):
        for i in range(j + 1):
            s = _blk(i, j)
            c[s * U:(s + 1) * U] = -(1.0 if i == j else 2.0) * w  # max

    A = np.zeros((0, nv))
    b = np.zeros(0)

    if not use_wsos:
        # matrix WSOS: svec-scaled blocks of H - Q
        G = np.zeros((sdim * U, nv))
        h = np.zeros(sdim * U)
        for j in range(R):
            for i in range(j + 1):
                s = _blk(i, j)
                scale = 1.0 if i == j else RT2
                G[s * U:(s + 1) * U, s * U:(s + 1) * U] = scale * np.eye(U)
                h[s * U:(s + 1) * U] = scale * H[(i, j)]
        cone = cones.WSOSInterpPosSemidefTri(R, U, Ps)
        return Model(c, A, b, G, h, [cone])

    # scalar WSOS with y-probe lift: for i<j the block becomes
    # 2(H_ij - q_ij) + (H_ii - q_ii) + (H_jj - q_jj); Ps -> kron(ypts, P)
    ypts = np.zeros((sdim, R))
    G = np.zeros((sdim * U, nv))
    h = np.zeros(sdim * U)
    for j in range(R):
        for i in range(j + 1):
            s = _blk(i, j)
            rows = slice(s * U, (s + 1) * U)
            if i == j:
                ypts[s, j] = 1.0
                G[rows, s * U:(s + 1) * U] = np.eye(U)
                h[rows] = H[(i, j)]
            else:
                ypts[s, i] = ypts[s, j] = 1.0
                G[rows, s * U:(s + 1) * U] = 2.0 * np.eye(U)
                sii, sjj = _blk(i, i), _blk(j, j)
                G[rows, sii * U:(sii + 1) * U] += np.eye(U)
                G[rows, sjj * U:(sjj + 1) * U] += np.eye(U)
                h[rows] = 2.0 * H[(i, j)] + H[(i, i)] + H[(j, j)]
    new_Ps = [np.kron(ypts, np.asarray(P)) for P in Ps]
    cone = cones.WSOSInterpNonnegative(U * sdim, new_Ps)
    return Model(c, A, b, G, h, [cone])


MINIMAL = [dict(n=1, halfdeg=1, R=1, use_wsos=False),
           dict(n=1, halfdeg=1, R=1, use_wsos=True),
           dict(n=1, halfdeg=1, R=2, use_wsos=False),
           dict(n=1, halfdeg=1, R=2, use_wsos=True)]
FAST = [dict(n=3, halfdeg=1, R=3, use_wsos=False),
        dict(n=3, halfdeg=1, R=3, use_wsos=True),
        dict(n=2, halfdeg=2, R=2, use_wsos=False)]
BENCH = [dict(n=2, halfdeg=3, R=4, use_wsos=False)]
