"""Polynomial density estimation: maximize the geomean of the density at
observed points subject to the density being WSOS and integrating to 1.

max geomean(f(X_i))  s.t.  w'f = 1 (quadrature),  f in WSOS cone.
Parity: `examples/densityest/native.jl` (use_wsos + hypogeomean variant).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate
from hypatia_tpu.polyutils.interp import make_chebyshev_vandermonde


def build(num_obs: int = 20, n: int = 1, deg: int = 4, seed: int = 1):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((num_obs, n))
    # rescale observations into the unit box
    minX, maxX = X.min(axis=0), X.max(axis=0)
    X = (X - (minX + maxX) / 2) / ((maxX - minX) / 2)

    halfdeg = (deg + 1) // 2
    dom = BoxDomain(-np.ones(n), np.ones(n))
    U, pts, Ps, V, w = interpolate(dom, halfdeg, calc_V=True, get_quadr=True,
                                   seed=seed)
    V_X = make_chebyshev_vandermonde(X, 2 * halfdeg)
    # interpolation-basis evaluations of the density at the observations
    X_pts_polys = np.linalg.solve(V.T, V_X.T).T  # (num_obs, U)

    # vars (t, f)
    nv = 1 + U
    c = np.concatenate([[-1.0], np.zeros(U)])
    A = np.concatenate([[0.0], w])[None, :]
    b = np.array([1.0])
    # (t, X_pts_polys f) in HypoGeoMean
    G1 = np.zeros((1 + num_obs, nv))
    G1[0, 0] = -1.0
    G1[1:, 1:] = -X_pts_polys
    h1 = np.zeros(1 + num_obs)
    # f in WSOS
    G2 = np.hstack([np.zeros((U, 1)), -np.eye(U)])
    h2 = np.zeros(U)
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [cones.HypoGeoMean(1 + num_obs),
                 cones.WSOSInterpNonnegative(U, Ps)]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(num_obs=10, n=1, deg=2)]
FAST = [dict(num_obs=50, n=2, deg=4)]
BENCH = [dict(num_obs=200, n=2, deg=6)]
