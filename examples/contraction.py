"""Contraction metric analysis for the Moore-Greitzer model
(Aylward, Parrilo & Slotine).

Feasibility: find a polynomial metric M(x) (2x2, entries deg <= M_deg)
with M - delta I WSOS-PSD and -(M J + (M J)' + dM/dt + beta M) - delta I
WSOS-PSD, where J is the dynamics Jacobian (transposed convention) and
dM/dt the Lie derivative. beta=0.7 is feasible; beta=2 infeasible.
Parity: `examples/contraction/JuMP.jl` (matrix-WSOS formulation).
"""

import itertools

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import FreeDomain, interpolate

RT2 = np.sqrt(2.0)


def _monos(n, maxdeg):
    out = []
    for deg in range(maxdeg + 1):
        for combo in itertools.combinations_with_replacement(range(n), deg):
            e = [0] * n
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


def build(beta: float = 0.7, M_deg: int = 4, delta: float = 1e-3,
          seed: int = 1):
    n = 2
    dom = FreeDomain(n)
    M_halfdeg = (M_deg + 1) // 2
    U_M, pts_M, Ps_M, _, _ = interpolate(dom, M_halfdeg, seed=seed)
    pts_M = np.asarray(pts_M)
    monos = _monos(n, 2 * M_halfdeg)
    L = len(monos)
    assert L == U_M

    # R = M J + (M J)' + dM/dt + beta M has degree M_deg + 2 (J deg 2,
    # f deg 3, dM deg M_deg-1)
    d_R = (M_deg + 2 + 1) // 2
    U_R, pts_R, Ps_R, _, _ = interpolate(dom, d_R, seed=seed)
    pts_R = np.asarray(pts_R)

    # dynamics f and Jacobian-transpose convention dfdx[k, j] = d f_j / d x_k
    def f_and_J(pts):
        x1, x2 = pts[:, 0], pts[:, 1]
        f = np.stack([-x2 - 1.5 * x1**2 - 0.5 * x1**3, 3 * x1 - x2], 1)
        J = np.empty((pts.shape[0], n, n))     # J[:, k, j] = d f_j / d x_k
        J[:, 0, 0] = -3 * x1 - 1.5 * x1**2
        J[:, 1, 0] = -1.0
        J[:, 0, 1] = 3.0
        J[:, 1, 1] = -1.0
        return f, J

    # vars: theta = (m11, m12, m22) coeffs, L each
    nv = 3 * L
    off = {(0, 0): 0, (0, 1): L, (1, 0): L, (1, 1): 2 * L}

    G_rows, h_rows, cone_list = [], [], []

    # M - delta I WSOS-PSD at pts_M
    VM = _vander(pts_M, monos)
    G1 = np.zeros((3 * U_M, nv))
    h1 = np.zeros(3 * U_M)
    for s, (i, j) in enumerate(((0, 0), (0, 1), (1, 1))):
        scale = 1.0 if i == j else RT2
        G1[s * U_M:(s + 1) * U_M, off[(i, j)]:off[(i, j)] + L] = -scale * VM
        if i == j:
            h1[s * U_M:(s + 1) * U_M] = -delta
    G_rows.append(G1)
    h_rows.append(h1)
    cone_list.append(cones.WSOSInterpPosSemidefTri(n, U_M, Ps_M))

    # -R - delta I WSOS-PSD at pts_R
    fR, JR = f_and_J(pts_R)
    VR = _vander(pts_R, monos)
    DR = [_vander_d(pts_R, monos, k) for k in range(n)]
    # dM/dt map applied to entry coeffs: sum_k f_k * dM_ij/dx_k
    dMdt_map = sum(fR[:, k][:, None] * DR[k] for k in range(n))
    G2 = np.zeros((3 * U_R, nv))
    h2 = np.zeros(3 * U_R)
    for s, (i, j) in enumerate(((0, 0), (0, 1), (1, 1))):
        scale = 1.0 if i == j else RT2
        rows = slice(s * U_R, (s + 1) * U_R)
        # R_ij = sum_k (M_ik dfdx[k,j] + M_jk dfdx[k,i]) + dMdt_ij + beta M_ij
        blocks = np.zeros((U_R, nv))
        for k in range(n):
            blocks[:, off[(i, k)]:off[(i, k)] + L] += \
                JR[:, k, j][:, None] * VR
            blocks[:, off[(j, k)]:off[(j, k)] + L] += \
                JR[:, k, i][:, None] * VR
        blocks[:, off[(i, j)]:off[(i, j)] + L] += dMdt_map + beta * VR
        # cone coord = scale * (-R_ij - delta 1{i==j})
        G2[rows] = scale * blocks
        if i == j:
            h2[rows] = -delta
    G_rows.append(G2)
    h_rows.append(h2)
    cone_list.append(cones.WSOSInterpPosSemidefTri(n, U_R, Ps_R))

    return Model(np.zeros(nv), np.zeros((0, nv)), np.zeros(0),
                 np.vstack(G_rows), np.concatenate(h_rows), cone_list)


def is_feasible(beta):
    return beta < 1.0


MINIMAL = [dict(beta=0.7, M_deg=4)]
FAST = [dict(beta=0.7, M_deg=6)]
BENCH = [dict(beta=0.7, M_deg=6)]
# pure feasibility problem (c = 0): residual convergence near the
# analytic center is slow; run the example-test protocol relaxed
TEST_OPTIONS = dict(default_tol_relax=100)
TEST_VIOL_BOUND = 1e-4
