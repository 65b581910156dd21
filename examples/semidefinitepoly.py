"""SOS decomposition test for polynomial matrices (matrix-SOS membership).

Check whether a polynomial matrix H(x) is an SOS matrix by testing svec
membership in WSOSInterpPosSemidefTri (primal feasibility form), or via
the dual form min <z, H_svec> over z in the dual cone.
Parity: `examples/semidefinitepoly/JuMP.jl` + `data.jl` (the scalar-SOS
PSD formulation is a SumOfSquares.jl toolchain path, not ported).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import FreeDomain, interpolate

RT2 = np.sqrt(2.0)


def _matpoly1(pts):
    x = pts[:, 0]
    M = np.array([
        [x + 2 * x**3, np.ones_like(x)],
        [-x**2 + 2, 3 * x**2 - x + 1],
    ])  # (2, 2, U)
    H = np.einsum("kiu,kju->iju", M, M)   # M' M pointwise
    return H, 1, True


def _matpoly2(pts):
    x = pts[:, 0]
    H = (12 * x**2 + 4)[None, None, :]    # Hessian of x^4 + 2x^2
    return H, 1, True


def _matpoly5(pts):
    x = pts[:, 0]
    H = np.array([
        [x**2 - 2 * x + 2, x],
        [x, x**2],
    ])
    return H, 1, True


def _matpoly6(pts):
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    H = np.array([
        [x**2 + 2 * y**2, -x * y, -x * z],
        [-x * y, y**2 + 2 * z**2, -y * z],
        [-x * z, -y * z, z**2 + 2 * x**2],
    ])  # Choi counterexample: PSD-valued but not SOS
    return H, 3, False


MATPOLYS = {
    "matpoly1": (_matpoly1, 3),   # (builder, halfdeg)
    "matpoly2": (_matpoly2, 1),
    "matpoly5": (_matpoly5, 1),
    "matpoly6": (_matpoly6, 2),
}


def build(matpoly: str = "matpoly2", use_dual: bool = False, seed: int = 1):
    fn, halfdeg = MATPOLYS[matpoly]
    probe = fn(np.zeros((1, 3)))
    n = probe[1]
    U, pts, Ps, V, w = interpolate(FreeDomain(n), halfdeg, seed=seed)
    H, _, _ = fn(pts)
    side = H.shape[0]

    # svec-interleaved values: U-block per (i<=j) pair, off-diag x rt2
    hvec = []
    for j in range(side):
        for i in range(j + 1):
            hvec.append(H[i, j] * (1.0 if i == j else RT2))
    hvec = np.concatenate(hvec)
    dim = len(hvec)
    cone = cones.WSOSInterpPosSemidefTri(side, U, Ps, use_dual=use_dual)

    if use_dual:
        # min <z, H_svec> over z in the dual cone: 0 iff H is SOS,
        # unbounded (DualInfeasible) otherwise
        c = hvec
        G = -np.eye(dim)
        h = np.zeros(dim)
        return Model(c, np.zeros((0, dim)), np.zeros(0), G, h, [cone])
    # pure feasibility: h in cone, no variables
    return Model(np.zeros(0), np.zeros((0, 0)), np.zeros(0),
                 np.zeros((dim, 0)), hvec, [cone])


def is_feasible(matpoly: str):
    return fn_feas[matpoly]


fn_feas = {"matpoly1": True, "matpoly2": True, "matpoly5": True,
           "matpoly6": False}

MINIMAL = [dict(matpoly="matpoly2", use_dual=True),
           dict(matpoly="matpoly5", use_dual=True),
           dict(matpoly="matpoly5", use_dual=False)]
# the dual-form instances have their optimum at the cone apex (z = 0,
# objective exactly 0) — run the test protocol at extra relaxation
TEST_OPTIONS = dict(default_tol_relax=30)
TEST_VIOL_BOUND = 1e-5
FAST = [dict(matpoly="matpoly1", use_dual=True),
        dict(matpoly="matpoly1", use_dual=False)]
BENCH = [dict(matpoly="matpoly1", use_dual=False)]
