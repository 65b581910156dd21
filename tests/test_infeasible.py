"""Per-cone-family infeasibility certificate instances.

Parity target: the reference's per-cone primal/dual-infeasible instance
functions in `test/nativeinstances.jl` (e.g. nonnegative3/4, epinormeucl3,
possemideftri6/7, hypoperlog5, ...).  Each instance asserts not just the
status but the Farkas RAY certificate the solver returns
(`nativeinstances.jl:66-78` semantics, postprocess tau=1 ray):

- PrimalInfeasible:  z in K*, y with  G'z + A'y ~ 0  and  b'y + h'z < 0
- DualInfeasible:    x, s with  A x ~ 0,  G x + s ~ 0 (s in K)  and  c'x < 0
"""

import numpy as np
import pytest

from hypatia_tpu import Model, Solver, cones


def check_ray(c, A, b, G, h, cone_list, expect, **opts):
    c, b, h = (np.asarray(c, dtype=float).ravel(),
               np.asarray(b, dtype=float).ravel(),
               np.asarray(h, dtype=float).ravel())
    A = np.asarray(A, dtype=float).reshape(len(b), len(c))
    G = np.asarray(G, dtype=float).reshape(len(h), len(c))
    model = Model(c, A, b, G, h, cone_list)
    solver = Solver(**opts)
    solver.load(model)
    solver.solve()
    assert solver.get_status() == expect, (
        f"status {solver.get_status()} != {expect}")
    x, y, z, s = (solver.get_x(), solver.get_y(), solver.get_z(),
                  solver.get_s())
    if expect == "PrimalInfeasible":
        margin = -(b @ y + h @ z)
        assert margin > 0
        assert np.max(np.abs(G.T @ z + A.T @ y)) <= 1e-6 * margin
    else:
        margin = -(c @ x)
        assert margin > 0
        assert (np.max(np.abs(A @ x), initial=0.0)
                <= 1e-6 * margin)
        assert np.max(np.abs(G @ x + s)) <= 1e-6 * margin
    return solver


_ZA = np.zeros((0, 1))
_ZB = np.zeros(0)


def _col(dim, row, val=-1.0):
    G = np.zeros((dim, 1))
    G[row, 0] = val
    return G


# --- linear family ---------------------------------------------------------


def test_nonnegative_primal_inf():
    # x >= 0 and x <= -1
    G = np.array([[-1.0], [1.0]])
    check_ray([1.0], _ZA, _ZB, G, [0.0, -1.0], [cones.Nonnegative(2)],
              "PrimalInfeasible")


def test_nonnegative_dual_inf():
    check_ray([-1.0], _ZA, _ZB, [[-1.0]], [0.0], [cones.Nonnegative(1)],
              "DualInfeasible")


# --- second-order family ---------------------------------------------------


def test_epinormeucl_primal_inf():
    # s = (-1, x, 0.5): epigraph coordinate forced negative
    check_ray([1.0], _ZA, _ZB, _col(3, 1), [-1.0, 0.0, 0.5],
              [cones.EpiNormEucl(3)], "PrimalInfeasible")


def test_epinormeucl_dual_inf():
    # min -u, (u, x, 0) in SOC: unbounded
    G = np.array([[-1.0, 0.0], [0.0, -1.0], [0.0, 0.0]])
    check_ray([-1.0, 0.0], np.zeros((0, 2)), _ZB, G, np.zeros(3),
              [cones.EpiNormEucl(3)], "DualInfeasible")


def test_epipersquare_primal_inf():
    # s = (-1, 1, x): u >= 0 required
    check_ray([1.0], _ZA, _ZB, _col(3, 2), [-1.0, 1.0, 0.0],
              [cones.EpiPerSquare(3)], "PrimalInfeasible")


def test_epipersquare_dual_inf():
    # min -u with (u, 1, 0) RSOC: unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 0), [0.0, 1.0, 0.0],
              [cones.EpiPerSquare(3)], "DualInfeasible")


def test_epinorminf_primal_inf():
    check_ray([1.0], _ZA, _ZB, _col(3, 1), [-0.5, 0.0, 1.0],
              [cones.EpiNormInf(3)], "PrimalInfeasible")


def test_epinorminf_dual_inf():
    check_ray([-1.0], _ZA, _ZB, _col(3, 0), [0.0, 0.0, 0.0],
              [cones.EpiNormInf(3)], "DualInfeasible")


# --- power / geomean family ------------------------------------------------


def test_generalizedpower_primal_inf():
    # ||(x, 2)|| <= 1^a * 1^b = 1 impossible
    check_ray([1.0], _ZA, _ZB, _col(4, 2), [1.0, 1.0, 0.0, 2.0],
              [cones.GeneralizedPower([0.5, 0.5], 2)], "PrimalInfeasible")


def test_generalizedpower_dual_inf():
    # min -u1 with (u1, 1, 0) in power cone: unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 0), [0.0, 1.0, 0.0],
              [cones.GeneralizedPower([0.5, 0.5], 1)], "DualInfeasible")


def test_hypogeomean_primal_inf():
    # x <= geomean(1,1) = 1 and x >= 2
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    G[3, 0] = -1.0
    h = [0.0, 1.0, 1.0, -2.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.HypoGeoMean(3), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_hypogeomean_dual_inf():
    # min -w1 with (0, w1, w1) hypo-geomean: unbounded
    G = np.array([[0.0], [-1.0], [-1.0]])
    check_ray([-1.0], _ZA, _ZB, G, np.zeros(3), [cones.HypoGeoMean(3)],
              "DualInfeasible")


def test_hypopowermean_primal_inf():
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    G[3, 0] = -1.0
    h = [0.0, 1.0, 1.0, -2.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.HypoPowerMean([0.5, 0.5]), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_hypopowermean_dual_inf():
    G = np.array([[0.0], [-1.0], [-1.0]])
    check_ray([-1.0], _ZA, _ZB, G, np.zeros(3),
              [cones.HypoPowerMean([0.5, 0.5])], "DualInfeasible")


# --- exp / entropy family --------------------------------------------------


def test_hypoperlog_primal_inf():
    # x <= 1*log(1) = 0 and x >= 1
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    G[3, 0] = -1.0
    h = [0.0, 1.0, 1.0, -1.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.HypoPerLog(3), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_hypoperlog_dual_inf():
    # min -w with (0, 1, w): w >= 1 feasible, unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 2), [0.0, 1.0, 0.0],
              [cones.HypoPerLog(3)], "DualInfeasible")


def test_epirelentropy_primal_inf():
    # -1 >= x log(x) has no solution (min of x log x is -1/e)
    check_ray([1.0], _ZA, _ZB, _col(3, 2), [-1.0, 1.0, 0.0],
              [cones.EpiRelEntropy(3)], "PrimalInfeasible")


def test_epirelentropy_dual_inf():
    # min -v with (1, v, 1): v >= e^-1 feasible, unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 1), [1.0, 0.0, 1.0],
              [cones.EpiRelEntropy(3)], "DualInfeasible")


def test_sepspectral_neglog_primal_inf():
    # u = -10 >= -log(w), w <= 1 forced -> need w >= e^10: infeasible
    G = np.zeros((4, 1))
    G[2, 0] = -1.0
    G[3, 0] = 1.0
    h = [-10.0, 1.0, 0.0, 1.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.EpiPerSepSpectralVector(cones.NegLogSSF(), 1),
               cones.Nonnegative(1)], "PrimalInfeasible")


def test_sepspectral_neglog_dual_inf():
    # min -w with (1, 1, w): -log(w) <= 1 -> w >= e^-1, unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 2), [1.0, 1.0, 0.0],
              [cones.EpiPerSepSpectralVector(cones.NegLogSSF(), 1)],
              "DualInfeasible")


# --- PSD / matrix family ---------------------------------------------------


def test_possemideftri_primal_inf():
    # 2x2 svec (s11, s12*sqrt2, s22) with s11 = -1 fixed
    check_ray([1.0], _ZA, _ZB, _col(3, 1), [-1.0, 0.0, 1.0],
              [cones.PosSemidefTri(3)], "PrimalInfeasible")


def test_possemideftri_dual_inf():
    # min -tr(X) over PSD: unbounded along identity
    c = [-1.0, 0.0, -1.0]
    check_ray(c, np.zeros((0, 3)), _ZB, -np.eye(3), np.zeros(3),
              [cones.PosSemidefTri(3)], "DualInfeasible")


def test_doublynonnegative_primal_inf():
    # offdiag x with x <= -1 forced; DNN needs entrywise >= 0
    G = np.zeros((4, 1))
    G[1, 0] = -1.0
    G[3, 0] = 1.0
    h = [1.0, 0.0, 1.0, -1.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.DoublyNonnegativeTri(3), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_doublynonnegative_dual_inf():
    c = [-1.0, 0.0, -1.0]
    check_ray(c, np.zeros((0, 3)), _ZB, -np.eye(3), np.zeros(3),
              [cones.DoublyNonnegativeTri(3)], "DualInfeasible")


def test_linmatrixineq_primal_inf():
    # w1*I + w2*diag(1,-1) > 0 with w1 = -1 forced: impossible
    As = [np.eye(2), np.diag([1.0, -1.0])]
    G = np.zeros((2, 1))
    G[1, 0] = -1.0
    check_ray([1.0], _ZA, _ZB, G, [-1.0, 0.0],
              [cones.LinMatrixIneq(As)], "PrimalInfeasible")


def test_linmatrixineq_dual_inf():
    As = [np.eye(2), np.diag([1.0, -1.0])]
    G = np.zeros((2, 2))
    G[0, 0] = -1.0
    G[1, 1] = -1.0
    check_ray([-1.0, 0.0], np.zeros((0, 2)), _ZB, G, np.zeros(2),
              [cones.LinMatrixIneq(As)], "DualInfeasible")


def test_epinormspectral_primal_inf():
    # sigma_max <= u with u = -1 fixed (1x2 W)
    check_ray([1.0], _ZA, _ZB, _col(3, 1), [-1.0, 0.0, 1.0],
              [cones.EpiNormSpectral(1, 2)], "PrimalInfeasible")


def test_epinormspectral_dual_inf():
    check_ray([-1.0], _ZA, _ZB, _col(3, 0), np.zeros(3),
              [cones.EpiNormSpectral(1, 2)], "DualInfeasible")


def test_matrixepipersquare_primal_inf():
    # (U, v, W) with v = -1 fixed
    check_ray([1.0], _ZA, _ZB, _col(3, 2), [1.0, -1.0, 0.0],
              [cones.MatrixEpiPerSquare(1, 1)], "PrimalInfeasible")


def test_matrixepipersquare_dual_inf():
    # min -U11 with (U, 1, 0): unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 0), [0.0, 1.0, 0.0],
              [cones.MatrixEpiPerSquare(1, 1)], "DualInfeasible")


def test_hyporootdettri_primal_inf():
    # x <= det([[1]]) = 1 and x >= 2
    G = np.zeros((3, 1))
    G[0, 0] = -1.0
    G[2, 0] = -1.0
    h = [0.0, 1.0, -2.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.HypoRootdetTri(2), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_hyporootdettri_dual_inf():
    # min -x with (x, x) in hypo-rootdet (d=1: u <= W11): unbounded
    G = np.array([[-1.0], [-1.0]])
    check_ray([-1.0], _ZA, _ZB, G, np.zeros(2),
              [cones.HypoRootdetTri(2)], "DualInfeasible")


def test_hypoperlogdettri_primal_inf():
    # x <= 1*logdet([[1]]) = 0 and x >= 1
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    G[3, 0] = -1.0
    h = [0.0, 1.0, 1.0, -1.0]
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.HypoPerLogdetTri(3), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_hypoperlogdettri_dual_inf():
    # min -W11 with (0, 1, w): logdet >= 0 -> w >= 1, unbounded
    check_ray([-1.0], _ZA, _ZB, _col(3, 2), [0.0, 1.0, 0.0],
              [cones.HypoPerLogdetTri(3)], "DualInfeasible")


def test_epitrrelentropy_primal_inf():
    # u = -1 with V = W = I fixed: tr RE = 0 > -1 (d=2 svec dim 3 each)
    dim = 1 + 3 + 3
    sI = [1.0, 0.0, 1.0]
    h = np.concatenate([[-1.0], sI, sI, [0.0]])
    G = np.zeros((dim + 1, 1))
    G[dim, 0] = -1.0
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.EpiTrRelEntropyTri(dim), cones.Nonnegative(1)],
              "PrimalInfeasible", default_tol_relax=100)


# --- WSOS family ------------------------------------------------------------


def _wsos_data(deg=2):
    from hypatia_tpu.polyutils import BoxDomain, interpolate
    U, pts, Ps, V, w = interpolate(BoxDomain(-np.ones(1), np.ones(1)), deg)
    return U, pts, Ps


def test_wsos_primal_inf():
    # (1 + t^2) - x must be WSOS on [-1,1] (so x <= 1) and x >= 3
    U, pts, Ps = _wsos_data()
    fvals = pts[:, 0] ** 2 + 1.0
    G = np.concatenate([np.ones((U, 1)), [[-1.0]]])
    h = np.concatenate([fvals, [-3.0]])
    check_ray([1.0], _ZA, _ZB, G, h,
              [cones.WSOSInterpNonnegative(U, Ps), cones.Nonnegative(1)],
              "PrimalInfeasible")


def test_wsos_dual_inf():
    # min -x with x * 1 WSOS: any x >= 0, unbounded
    U, pts, Ps = _wsos_data()
    G = -np.ones((U, 1))
    check_ray([-1.0], _ZA, _ZB, G, np.zeros(U),
              [cones.WSOSInterpNonnegative(U, Ps)], "DualInfeasible")
