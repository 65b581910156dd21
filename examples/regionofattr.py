"""Region of attraction of a univariate cubic system (Henrion & Korda).

Occupation-measure LP relaxation: min int w  s.t.
-dv/dt - dv/dx f >= 0 on [-1,1]x[0,1], w - v(.,0) - 1 >= 0 on [-1,1],
v(.,1) >= 0 near the target, w >= 0 on [-1,1]; f = 100 x(x-.5)(x+.5).
Parity: `examples/regionofattr/JuMP.jl` (WSOS formulation; the SOS/PSD
variant is a SumOfSquares toolchain path).
"""

import itertools

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate


def _monos(nvars, maxdeg):
    out = []
    for deg in range(maxdeg + 1):
        for combo in itertools.combinations_with_replacement(range(nvars),
                                                             deg):
            e = [0] * nvars
            for v in combo:
                e[v] += 1
            out.append(tuple(e))
    return out


def _vander(pts, monos):
    V = np.ones((pts.shape[0], len(monos)))
    for c, e in enumerate(monos):
        for i, p in enumerate(e):
            if p:
                V[:, c] *= pts[:, i]**p
    return V


def _vander_d(pts, monos, j):
    V = np.zeros((pts.shape[0], len(monos)))
    for c, e in enumerate(monos):
        if e[j] == 0:
            continue
        col = float(e[j]) * np.ones(pts.shape[0])
        for i, p in enumerate(e):
            q = p - 1 if i == j else p
            if q:
                col = col * pts[:, i]**q
        V[:, c] = col
    return V


def build(deg: int = 4, seed: int = 1):
    halfdeg = (deg + 1) // 2
    dom1 = BoxDomain(-np.ones(1), np.ones(1))
    dom2 = BoxDomain(np.array([-1.0, 0.0]), np.array([1.0, 1.0]))
    dom3 = BoxDomain(-0.01 * np.ones(1), 0.01 * np.ones(1))
    U1, pts1, Ps1, _, qw = interpolate(dom1, halfdeg, get_quadr=True,
                                       seed=seed)
    # NOTE: the reference samples dv/dt (degree deg+2) in the degree-deg
    # interpolation space, leaving the transport constraint under-resolved
    # (its optimum then depends on the choice of nodes). We interpolate at
    # degree deg+2 so the sampled constraint is exactly the WSOS
    # relaxation of dv/dt <= 0; likewise v(., 1) at full degree.
    U2, pts2, Ps2, _, _ = interpolate(dom2, (deg + 3) // 2, seed=seed)
    U3, pts3, Ps3, _, _ = interpolate(dom3, halfdeg, seed=seed)
    pts1, pts2, pts3 = map(np.asarray, (pts1, pts2, pts3))

    vm = _monos(2, deg)          # v over (x, t)
    wm = _monos(1, deg)          # w over x
    Lv, Lw = len(vm), len(wm)
    nv = Lv + Lw                 # vars (v coeffs, w coeffs)

    c = np.zeros(nv)
    c[Lv:] = _vander(pts1, wm).T @ np.asarray(qw)

    G_rows, h_rows, cone_list = [], [], []
    # -dvdt on dom2: dvdt = dv/dt + f(x) * dv/dx
    fvals = 100.0 * pts2[:, 0]**3 - 25.0 * pts2[:, 0]
    Dv = _vander_d(pts2, vm, 1) + fvals[:, None] * _vander_d(pts2, vm, 0)
    G = np.zeros((U2, nv))
    G[:, :Lv] = Dv
    G_rows.append(G)
    h_rows.append(np.zeros(U2))
    cone_list.append(cones.WSOSInterpNonnegative(U2, Ps2))
    # w - v(., 0) - 1 on dom1
    p10 = np.column_stack([pts1[:, 0], np.zeros(U1)])
    G = np.zeros((U1, nv))
    G[:, :Lv] = _vander(p10, vm)
    G[:, Lv:] = -_vander(pts1, wm)
    G_rows.append(G)
    h_rows.append(-np.ones(U1))
    cone_list.append(cones.WSOSInterpNonnegative(U1, Ps1))
    # v(., 1) on dom3
    p31 = np.column_stack([pts3[:, 0], np.ones(U3)])
    G = np.zeros((U3, nv))
    G[:, :Lv] = -_vander(p31, vm)
    G_rows.append(G)
    h_rows.append(np.zeros(U3))
    cone_list.append(cones.WSOSInterpNonnegative(U3, Ps3))
    # w on dom1
    G = np.zeros((U1, nv))
    G[:, Lv:] = -_vander(pts1, wm)
    G_rows.append(G)
    h_rows.append(np.zeros(U1))
    cone_list.append(cones.WSOSInterpNonnegative(U1, Ps1))

    return Model(c, np.zeros((0, nv)), np.zeros(0), np.vstack(G_rows),
                 np.concatenate(h_rows), cone_list)


MINIMAL = [dict(deg=4)]
FAST = [dict(deg=6), dict(deg=8)]
BENCH = [dict(deg=8)]
# occupation-measure LPs are ill-conditioned (dual measures are singular);
# run the example-test protocol at extra relaxation, like the reference's
# relaxed_tols instance options
TEST_OPTIONS = dict(default_tol_relax=100)
TEST_VIOL_BOUND = 1e-3
