"""Polynomial minimization via WSOS interpolant cones.

min_x f(x) over a box/ball domain == max mu s.t. f - mu is WSOS on the
domain: native formulation over point evaluations.

Parity: `examples/polymin/native.jl` (real case): vars mu; conic constraint
(f(pts) - mu * 1) in WSOSInterpNonnegative(U, Ps).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate


# some named polynomials from the reference's polyminreal data
# (`examples/polymin/data.jl` semantics; re-derived standard test functions)
def _goldsteinprice(x):
    x1, x2 = x[:, 0], x[:, 1]
    a = 1 + (x1 + x2 + 1) ** 2 * (
        19 - 14 * x1 + 3 * x1**2 - 14 * x2 + 6 * x1 * x2 + 3 * x2**2)
    b = 30 + (2 * x1 - 3 * x2) ** 2 * (
        18 - 32 * x1 + 12 * x1**2 + 48 * x2 - 36 * x1 * x2 + 27 * x2**2)
    return a * b


POLYS = {
    # name: (n, function on pts matrix, domain builder, halfdeg, true min)
    "box_quadratic": (2, lambda x: (x[:, 0] - 0.3) ** 2 + (x[:, 1] + 0.5) ** 2,
                      lambda: BoxDomain(-np.ones(2), np.ones(2)), 1, 0.0),
    "univariate_quartic": (1, lambda x: x[:, 0] ** 4 - 2 * x[:, 0] ** 2,
                           lambda: BoxDomain(-np.ones(1) * 2, np.ones(1) * 2),
                           2, -1.0),
    "goldsteinprice": (2, _goldsteinprice,
                       lambda: BoxDomain(-2 * np.ones(2), 2 * np.ones(2)), 7,
                       3.0),
}


def build(poly: str = "box_quadratic", halfdeg: int = None, seed: int = 1):
    n, f, dom_fn, default_halfdeg, _ = POLYS[poly]
    d = halfdeg or default_halfdeg
    dom = dom_fn()
    U, pts, Ps, V, w = interpolate(dom, d, seed=seed)
    fvals = np.asarray(f(pts), dtype=float)

    # max mu s.t. fvals - mu*ones in WSOS cone
    c = np.array([-1.0])
    A = np.zeros((0, 1))
    b = np.zeros(0)
    G = np.ones((U, 1))
    h = fvals
    return Model(c, A, b, G, h, [cones.WSOSInterpNonnegative(U, Ps)])


def true_min(poly: str):
    return POLYS[poly][4]


MINIMAL = [dict(poly="box_quadratic"), dict(poly="univariate_quartic")]
FAST = [dict(poly="goldsteinprice")]
BENCH = [dict(poly="goldsteinprice", halfdeg=9)]
