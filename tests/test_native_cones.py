"""Native instances for the vector cone zoo.

Tiny hand-checkable problems per cone with known optima (parity with the
per-cone instance functions in `test/nativeinstances.jl`).
"""

import numpy as np
import pytest

from hypatia_tpu import Model, cones, solve
from tests.test_native import build_solve_check


def test_epipersquare():
    """min u s.t. (u, 1, w0) in RSOC -> u* = ||w0||^2 / 2."""
    w0 = np.array([1.5, -0.5])
    c = [1.0]
    A = np.zeros((0, 1))
    b = np.zeros(0)
    G = np.array([[-1.0], [0.0], [0.0], [0.0]])
    h = np.concatenate([[0.0, 1.0], w0])
    build_solve_check(c, A, b, G, h, [cones.EpiPerSquare(4)],
                      expect_obj=float(w0 @ w0) / 2)


def test_epinorminf_primal():
    """min u s.t. w = w0 -> u* = ||w0||_inf."""
    w0 = np.array([0.4, -1.2, 0.7])
    c = [1.0]
    G = np.vstack([[-1.0, 0, 0, 0]]).T.reshape(4, 1) * 0
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], w0])
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiNormInf(4)], expect_obj=1.2)


def test_epinorminf_dual():
    """min u s.t. w = w0, over dual cone (l1 epigraph) -> u* = ||w0||_1."""
    w0 = np.array([0.4, -1.2, 0.7])
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], w0])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiNormInf(4, use_dual=True)],
                      expect_obj=float(np.abs(w0).sum()))


def test_generalizedpower():
    """max w s.t. (u0, w) in power cone -> w* = prod u0^alpha."""
    alpha = [0.3, 0.7]
    u0 = np.array([2.0, 1.5])
    c = [-1.0]
    G = np.zeros((3, 1))
    G[2, 0] = -1.0
    h = np.concatenate([u0, [0.0]])
    opt = float(np.prod(u0 ** np.asarray(alpha)))
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.GeneralizedPower(alpha, 1)], expect_obj=-opt)


def test_hypogeomean():
    """max u s.t. w = w0 -> u* = geomean(w0)."""
    w0 = np.array([1.0, 2.0, 4.0])
    c = [-1.0]
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], w0])
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoGeoMean(4)], expect_obj=-2.0)


def test_hypopowermean():
    """max u s.t. w = w0 -> u* = prod w0^alpha."""
    alpha = [0.25, 0.75]
    w0 = np.array([4.0, 1.0])
    c = [-1.0]
    G = np.zeros((3, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], w0])
    opt = float(np.prod(w0 ** np.asarray(alpha)))
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoPowerMean(alpha)], expect_obj=-opt)


def test_hypoperlog():
    """max u s.t. v = 1, w = w0 -> u* = sum log(w0)."""
    w0 = np.array([2.0, 3.0])
    c = [-1.0]
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], w0])
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoPerLog(4)],
                      expect_obj=-float(np.log(w0).sum()))


def test_epirelentropy():
    """min u s.t. v = v0, w = w0 -> u* = sum w0 log(w0/v0)."""
    v0 = np.array([1.0, 2.0])
    w0 = np.array([2.0, 1.5])
    c = [1.0]
    G = np.zeros((5, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], v0, w0])
    opt = float(np.sum(w0 * np.log(w0 / v0)))
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiRelEntropy(5)], expect_obj=opt)


def test_mixed_cones():
    """LP + SOC + geomean in one model: max geomean(w) s.t. sum w = 3,
    w >= 0 -> w* = 1, obj 1."""
    n = 3
    c = np.concatenate([[-1.0], np.zeros(n)])  # vars (t, w)
    A = np.concatenate([[0.0], np.ones(n)])[None, :]
    b = [3.0]
    G = np.zeros((1 + n + n, 1 + n))
    G[0, 0] = -1.0
    G[1:1 + n, 1:] = -np.eye(n)     # geomean w part
    G[1 + n:, 1:] = -np.eye(n)      # nonneg w
    h = np.zeros(1 + 2 * n)
    build_solve_check(c, A, b, G, h,
                      [cones.HypoGeoMean(1 + n), cones.Nonnegative(n)],
                      expect_obj=-1.0)


def test_epipersepspectral_vector_neglog():
    """min u s.t. v = 1, w = w0 with h = -log -> u* = -sum log(w0)
    (same value as hypoperlog negated)."""
    w0 = np.array([2.0, 3.0])
    c = [1.0]
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], w0])
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiPerSepSpectralVector(cones.NegLogSSF(), 2)],
                      expect_obj=-float(np.log(w0).sum()))


def test_epipersepspectral_vector_entropy():
    """min u s.t. v=1, w=w0 with h = x log x -> u* = sum w0 log w0."""
    w0 = np.array([0.5, 2.0])
    c = [1.0]
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], w0])
    build_solve_check(c, np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiPerSepSpectralVector(cones.NegEntropySSF(), 2)],
                      expect_obj=float(np.sum(w0 * np.log(w0))))


def test_wsos_univariate():
    """max mu s.t. x^2+1 - mu WSOS on [-1,1] -> mu* = 1 (model obj -1)."""
    from hypatia_tpu.polyutils import BoxDomain, interpolate
    U, pts, Ps, V, w = interpolate(BoxDomain(-np.ones(1), np.ones(1)), 2)
    fvals = pts[:, 0] ** 2 + 1.0
    G = np.ones((U, 1))
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, fvals,
                      [cones.WSOSInterpNonnegative(U, Ps)], expect_obj=-1.0)


def test_padua_points_quadrature():
    """Padua n=2 box rule (`realinterp.jl:208-275`): unisolvent points and
    cubature exact for all monomials of degree <= 2d on [-1,1]^2."""
    import numpy as np
    from hypatia_tpu.polyutils.interp import _padua_data, get_U

    for d in (1, 3):
        U, pts, P0, P0sub, V, w = _padua_data(d, calc_V=True, get_quadr=True)
        assert U == get_U(2, d)
        assert np.linalg.cond(V) < 10.0  # unisolvent, well-conditioned
        for i in range(2 * d + 1):
            for j in range(2 * d + 1 - i):
                approx = float(np.sum(w * pts[:, 0] ** i * pts[:, 1] ** j))
                exact = ((1 - (-1) ** (i + 1)) / (i + 1)) * (
                    (1 - (-1) ** (j + 1)) / (j + 1))
                assert abs(approx - exact) < 1e-12


def test_dual_form_sqrt_cones():
    """Dual-form (use_dual=True) solves through the qrchol syrk assembly,
    which consumes inv_sqrt_hess_prod (Gram convention Ubar'Ubar = H^-1):
    each cone family with sqrt oracles gets one dual-form instance.
    lambda_min via PSD, and min c'x over the dual-viewed SOC/RSOC."""
    rng = np.random.default_rng(4)

    # PSD dual form: min tr(CX), tr(X)=1, X in PSD* (= PSD)
    import jax.numpy as jnp
    from hypatia_tpu.ops.svec import smat_to_svec

    n = 3
    M = rng.standard_normal((n, n))
    C = (M + M.T) / 2
    dim = n * (n + 1) // 2
    cvec = np.asarray(smat_to_svec(jnp.asarray(C)))
    Ivec = np.asarray(smat_to_svec(jnp.asarray(np.eye(n))))
    model = Model(cvec, Ivec[None, :], np.ones(1), -np.eye(dim),
                  np.zeros(dim), [cones.PosSemidefTri(dim, use_dual=True)])
    s = solve(model)
    lam = np.linalg.eigvalsh(C).min()
    assert s.get_status() == "Optimal"
    assert abs(s.get_primal_obj() - lam) < 1e-5 * (1 + abs(lam))

    # SOC dual form (self-dual): min c'x, ||x|| <= 1 via dual view
    for cone in (cones.EpiNormEucl(5, use_dual=True),
                 cones.EpiPerSquare(5, use_dual=True)):
        cc = rng.standard_normal(4)
        G = np.zeros((5, 4))
        G[1:, :] = -np.eye(4)
        h = np.zeros(5)
        h[0] = 1.0
        m2 = Model(cc, np.zeros((0, 4)), np.zeros(0), G, h, [cone])
        s2 = solve(m2)
        assert s2.get_status() == "Optimal", type(cone).__name__
        if isinstance(cone, cones.EpiNormEucl):
            # SOC is self-dual: same optimum as the primal view
            assert abs(s2.get_primal_obj() + np.linalg.norm(cc)) < 1e-6
