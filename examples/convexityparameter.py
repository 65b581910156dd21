"""Strong-convexity parameter of a polynomial on a domain.

max mu  s.t.  Hessian(p)(x) - mu I is WSOS-PSD on the domain — the
largest mu with p - mu/2 ||x||^2 convex. Parity:
`examples/convexityparameter/JuMP.jl` (matrix-WSOS formulation; the
SumOfSquares PSD formulation is a JuMP toolchain path, not ported).
Known optima: poly1 -> mu = -4, poly2 -> mu = -2 (on domains
containing 0).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, FreeDomain, interpolate

RT2 = np.sqrt(2.0)


def _hess_poly1(pts):
    # p = (x+1)^2 (x-1)^2 = (x^2-1)^2; H = 12x^2 - 4 (1x1)
    x = pts[:, 0]
    return (12.0 * x**2 - 4.0)[None, None, :]


def _hess_poly2(pts):
    # p = sum x_i^4 - sum x_i^2; H = diag(12 x_i^2 - 2)
    n = pts.shape[1]
    U = pts.shape[0]
    H = np.zeros((n, n, U))
    for i in range(n):
        H[i, i] = 12.0 * pts[:, i]**2 - 2.0
    return H


POLYS = {"poly1": (_hess_poly1, 1), "poly2": (_hess_poly2, None)}
DOMS = {
    "dom1": lambda: FreeDomain(1),
    "dom2": lambda: BoxDomain(-np.ones(1), np.ones(1)),
    "dom3": lambda: FreeDomain(3),
    "dom4": lambda: BoxDomain(np.array([-1.0, 0.0]), np.array([1.0, 2.0])),
}
TRUE_MU = {("poly1", "dom1"): -4.0, ("poly1", "dom2"): -4.0,
           ("poly2", "dom3"): -2.0, ("poly2", "dom4"): -2.0}


def build(poly: str = "poly1", dom: str = "dom1", seed: int = 1):
    domain = DOMS[dom]()
    n = domain.dimension()
    hess_fn = POLYS[poly][0]
    U, pts, Ps, V, w = interpolate(domain, 1, seed=seed)
    H = hess_fn(np.asarray(pts))
    R = H.shape[0]
    assert R == n

    sdim = R * (R + 1) // 2
    c = np.array([-1.0])          # max mu
    G = np.zeros((sdim * U, 1))
    h = np.zeros(sdim * U)
    s = 0
    for j in range(R):
        for i in range(j + 1):
            scale = 1.0 if i == j else RT2
            h[s * U:(s + 1) * U] = scale * H[i, j]
            if i == j:
                G[s * U:(s + 1) * U, 0] = 1.0   # -mu on the diagonal
            s += 1
    cone = cones.WSOSInterpPosSemidefTri(R, U, Ps)
    return Model(c, np.zeros((0, 1)), np.zeros(0), G, h, [cone])


def true_mu(poly, dom):
    return TRUE_MU.get((poly, dom), np.nan)


MINIMAL = [dict(poly="poly1", dom="dom1"), dict(poly="poly1", dom="dom2")]
FAST = [dict(poly="poly2", dom="dom3"), dict(poly="poly2", dom="dom4")]
BENCH = [dict(poly="poly2", dom="dom3")]
