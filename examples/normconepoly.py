"""Pointwise norm-cone membership of vector-valued polynomials.

Check the sufficient WSOS condition for (p_1(x), ..., p_l(x)) to lie in
the epigraph of the L2 (or L1) norm for all x, via
WSOSInterpEpiNormEucl / WSOSInterpEpiNormOne feasibility.
Parity: `examples/normconepoly/JuMP.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import FreeDomain, interpolate

POLYS = {
    # name: (function pts -> list of l arrays, deg, is_feas)
    "polys1": (lambda x: [x**2 + 2, x], 2, True),
    "polys2": (lambda x: [2 * x**2 + 2, x, x], 2, True),
    "polys3": (lambda x: [x**2 + 2, x, x], 2, True),
    "polys4": (lambda x: [2 * x**4 + 8 * x**2 + 4, x + 2 + (x + 1)**2, x],
               4, True),
    "polys5": (lambda x: [x, x**2 + x], 2, False),
    "polys6": (lambda x: [x, x + 1], 2, False),
    "polys7": (lambda x: [x**2, x], 2, False),
    "polys8": (lambda x: [x + 2, x], 2, False),
    "polys9": (lambda x: [x - 1, x, x], 2, False),
}


def build(polys: str = "polys1", use_L2: bool = True, seed: int = 1):
    fn, deg, _ = POLYS[polys]
    halfdeg = (deg + 1) // 2
    U, pts, Ps, V, w = interpolate(FreeDomain(1), halfdeg, seed=seed)
    vals = fn(pts[:, 0])
    l = len(vals)
    hvec = np.concatenate([np.asarray(v, dtype=float) * np.ones(U)
                           for v in vals])
    cone_cls = (cones.WSOSInterpEpiNormEucl if use_L2
                else cones.WSOSInterpEpiNormOne)
    cone = cone_cls(l, U, Ps)
    return Model(np.zeros(0), np.zeros((0, 0)), np.zeros(0),
                 np.zeros((l * U, 0)), hvec, [cone])


def is_feasible(polys: str):
    return POLYS[polys][2]


MINIMAL = [dict(polys="polys1", use_L2=True),
           dict(polys="polys1", use_L2=False)]
FAST = [dict(polys="polys2"), dict(polys="polys3"), dict(polys="polys4"),
        dict(polys="polys2", use_L2=False), dict(polys="polys4",
                                                 use_L2=False)]
BENCH = [dict(polys="polys4")]
