"""Optimal control of Lotka-Volterra population dynamics (Korda 2016),
occupation-measure density LP.

min  int_B(l_x rho) + sum_j int_B(l_u_j sigma_j) + M int_B(rho_T)
s.t. rho <= 0 on the sphere (via a free multiplier of 1 - x'x),
     rho_T + b rho + div(rho f)/Q + sum_j div(sigma_j f_u[:, j])/Q >= 1,
     u_bar rho >= sigma_j,  rho_T >= 0,  sigma_j >= 0   (all on the ball)
with all densities polynomial of degree <= deg over 4 species.
Parity: `examples/lotkavolterra/JuMP.jl` (SumOfSquares formulation
re-expressed with native WSOS ball-domain cones; the sphere equality
domain is handled with an explicit ideal multiplier).
"""

import itertools

import numpy as np
from scipy.special import gamma as spgamma

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BallDomain, interpolate


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


def _ball_integral(e):
    """Integral of x^e over the unit n-ball (0 if any exponent odd)."""
    if any(a % 2 for a in e):
        return 0.0
    bs = [(a + 1) / 2.0 for a in e]
    return 2.0 * np.prod([spgamma(bb) for bb in bs]) \
        / (spgamma(sum(bs)) * (sum(e) + len(e)))


def build(deg: int = 2, seed: int = 1):
    n, m = 4, 8
    Q, q_off = 0.475, 0.525
    l_x = 1.0
    l_u = np.array([-1.0, 0.5, 0.6, 0.8, 1.1, 2.0, 4.0, 6.0])
    r = np.array([1.0, 0.6, 0.4, 0.2])
    Amat = np.array([[1.0, 0.3, 0.4, 0.2], [-0.2, 1.0, 0.4, -0.1],
                     [-0.1, -0.2, 1.0, 0.3], [-0.1, -0.2, -0.3, 1.0]])
    M = ((np.sum(np.abs(l_u)) + np.sum(l_u)) / 2.0 + l_x) * 0.01
    brho, u_bar = 1.0, 1.0
    f_u = np.hstack([-np.eye(n), np.eye(n)])

    monos = _monos(n, deg)
    L = len(monos)
    lam_monos = _monos(n, max(deg - 2, 0))
    Llam = len(lam_monos)
    # vars: (rho, rho_T, sigma_1..m, lambda)
    nv = (2 + m) * L + Llam
    o_rho, o_rhoT = 0, L
    o_sig = lambda j: (2 + j) * L
    o_lam = (2 + m) * L

    ints = np.array([_ball_integral(e) for e in monos])
    c = np.zeros(nv)
    c[o_rho:o_rho + L] = l_x * ints
    c[o_rhoT:o_rhoT + L] = M * ints
    for j in range(m):
        c[o_sig(j):o_sig(j) + L] = l_u[j] * ints

    ball = BallDomain(np.zeros(n), 1.0)

    def f_vals(pts):
        x_o = pts * Q + q_off
        fx = r[None, :] * x_o * (1.0 - x_o @ Amat.T)
        # d f_i / d x_h_i = Q * d/dx_o_i [r_i x_o_i (1 - (A x_o)_i)]
        dfd = np.empty_like(fx)
        for i in range(n):
            dfd[:, i] = Q * r[i] * (1.0 - x_o @ Amat[i]
                                    - x_o[:, i] * Amat[i, i])
        return fx, dfd

    G_rows, h_rows, cone_list = [], [], []

    def add_wsos(Gc, hc, halfdeg, pts_builder):
        U, pts, Ps, _, _ = interpolate(ball, halfdeg, seed=seed)
        pts = np.asarray(pts)
        Gb, hb = pts_builder(pts, U)
        G_rows.append(Gb)
        h_rows.append(hb)
        cone_list.append(cones.WSOSInterpNonnegative(U, Ps))

    # (1) -rho + lambda (1 - x'x) >= 0 on ball (=> rho <= 0 on sphere)
    def c1(pts, U):
        G = np.zeros((U, nv))
        G[:, o_rho:o_rho + L] = _vander(pts, monos)
        w = 1.0 - np.sum(pts**2, 1)
        G[:, o_lam:] = -w[:, None] * _vander(pts, lam_monos)
        return G, np.zeros(U)

    add_wsos(None, None, (deg + 1) // 2, c1)

    # (2) rho_T + b rho + div(rho f)/Q + sum_j div(sigma_j fu_j)/Q - 1 >= 0
    def c2(pts, U):
        fx, dfd = f_vals(pts)
        V = _vander(pts, monos)
        G = np.zeros((U, nv))
        G[:, o_rhoT:o_rhoT + L] = -V
        blk = brho * V
        for i in range(n):
            Di = _vander_d(pts, monos, i)
            blk = blk + (fx[:, i][:, None] * Di
                         + dfd[:, i][:, None] * V) / Q
        G[:, o_rho:o_rho + L] = -blk
        for j in range(m):
            i = j % n
            sgn = f_u[i, j]
            Dj = _vander_d(pts, monos, i)
            G[:, o_sig(j):o_sig(j) + L] = -sgn * Dj / Q
        return G, -np.ones(U)

    add_wsos(None, None, (deg + 2) // 2, c2)

    # (3) u_bar rho - sigma_j >= 0; (4) rho_T >= 0; (5) sigma_j >= 0
    def mk_c3(j):
        def c3(pts, U):
            V = _vander(pts, monos)
            G = np.zeros((U, nv))
            G[:, o_rho:o_rho + L] = -u_bar * V
            G[:, o_sig(j):o_sig(j) + L] = V
            return G, np.zeros(U)
        return c3

    def c4(pts, U):
        G = np.zeros((U, nv))
        G[:, o_rhoT:o_rhoT + L] = -_vander(pts, monos)
        return G, np.zeros(U)

    def mk_c5(j):
        def c5(pts, U):
            G = np.zeros((U, nv))
            G[:, o_sig(j):o_sig(j) + L] = -_vander(pts, monos)
            return G, np.zeros(U)
        return c5

    hd = (deg + 1) // 2
    for j in range(m):
        add_wsos(None, None, hd, mk_c3(j))
    add_wsos(None, None, hd, c4)
    for j in range(m):
        add_wsos(None, None, hd, mk_c5(j))

    return Model(c, np.zeros((0, nv)), np.zeros(0), np.vstack(G_rows),
                 np.concatenate(h_rows), cone_list)


MINIMAL = [dict(deg=2)]
FAST = [dict(deg=3)]
BENCH = [dict(deg=4)]
TEST_OPTIONS = dict(default_tol_relax=100)
TEST_VIOL_BOUND = 1e-3
