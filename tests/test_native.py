"""Native-interface solver integration tests.

Parity with `test/nativeinstances.jl`: tiny conic programs with known optima,
asserting the full conic certificate (`nativeinstances.jl:57-78`):
obj match, A x = b, G x + s = h, G'z + A'y = -c, s'z = 0.
"""

import numpy as np
import pytest

from hypatia_tpu import Model, Solver, cones


def build_solve_check(c, A, b, G, h, cone_list, tol=1e-7, obj_offset=0.0,
                      expect_status="Optimal", expect_obj=None, **opts):
    tol = opts.pop("check_tol", tol)
    model = Model(c, A, b, G, h, cone_list, obj_offset=obj_offset)
    solver = Solver(**opts)
    solver.load(model)
    solver.solve()
    assert solver.get_status() == expect_status, (
        f"status {solver.get_status()} != {expect_status}")
    if expect_status != "Optimal":
        return solver
    pobj = solver.get_primal_obj()
    dobj = solver.get_dual_obj()
    assert abs(pobj - dobj) <= tol * (1 + abs(pobj) + abs(dobj))
    if expect_obj is not None:
        assert abs(pobj - expect_obj) <= tol * (1 + abs(expect_obj))
    x, y, z, s = (solver.get_x(), solver.get_y(), solver.get_z(),
                  solver.get_s())
    c, b, h = (np.asarray(c, dtype=float).ravel(),
               np.asarray(b, dtype=float).ravel(),
               np.asarray(h, dtype=float).ravel())
    A = np.asarray(A, dtype=float).reshape(len(b), len(c))
    G = np.asarray(G, dtype=float).reshape(len(h), len(c))
    # certificate checks
    assert np.allclose(A @ x, b, atol=10 * tol, rtol=10 * tol)
    assert np.allclose(G @ x + s, h, atol=10 * tol, rtol=10 * tol)
    assert np.allclose(G.T @ z + A.T @ y, -c, atol=10 * tol, rtol=10 * tol)
    assert abs(float(s @ z)) <= 100 * tol * (1 + abs(pobj))
    return solver


ALL_CONFIGS = [
    dict(syssolver="qrchol", reduce=True),
    dict(syssolver="qrchol", reduce=False),
    dict(syssolver="symindef", preprocess=False, reduce=False),
    dict(syssolver="naive", preprocess=False, reduce=False),
    dict(syssolver="naiveelim", preprocess=False, reduce=False),
    dict(syssolver="naiveelim", preprocess=False, reduce=False,
         naiveelim_inv_hess=False),
    dict(syssolver="qrchol", schur_syrk=False),
    dict(syssolver="qrchol", group_cones=False),
    # the accelerator-default refinement-correction solve (inverse +
    # Richardson), exercised on CPU where "chol" is the default
    dict(syssolver="qrchol", schur_acc_solve="inv_corr"),
    # indirect solvers are tested at relaxed tolerances, like the
    # reference's inst_indirect set (`nativesets.jl:169-175`)
    dict(syssolver="symindef_indirect", preprocess=False, reduce=False,
         default_tol_relax=10000, tol_slow=1e-5, check_tol=1e-3),
    dict(syssolver="qrchol", stepper="predorcent"),
    dict(syssolver="qrchol", stepper="predorcent", use_adjustment=False,
         use_curve_search=False),
    dict(syssolver="qrchol", use_adjustment=False),
]


@pytest.mark.quick
@pytest.mark.parametrize("opts", ALL_CONFIGS,
                         ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_lp_small(opts):
    """min -x1 - x2  s.t. x1 + x2 = 1, x >= 0; opt = -1."""
    c = [-1.0, -1.0]
    A = [[1.0, 1.0]]
    b = [1.0]
    G = -np.eye(2)
    h = [0.0, 0.0]
    build_solve_check(c, A, b, G, h, [cones.Nonnegative(2)],
                      expect_obj=-1.0, **opts)


@pytest.mark.parametrize("opts", ALL_CONFIGS,
                         ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_lp_random(opts):
    """Random feasible LP like `examples/linearopt/native.jl`."""
    rng = np.random.default_rng(1)
    m, n = 8, 16
    A = 10 * rng.random((m, n))
    b = A.sum(axis=1)
    c = rng.random(n)
    G = -np.eye(n)
    h = np.zeros(n)
    loose = opts.get("check_tol", 1e-6)
    s1 = build_solve_check(c, A, b, G, h, [cones.Nonnegative(n)], **opts)
    # cross-validate objective against scipy linprog
    import scipy.optimize
    res = scipy.optimize.linprog(c, A_eq=A, b_eq=b, bounds=(0, None))
    assert abs(s1.get_primal_obj() - res.fun) < loose * (1 + abs(res.fun))


@pytest.mark.parametrize("opts", ALL_CONFIGS[:3],
                         ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_socp_small(opts):
    """min u s.t. u >= ||(x-1, 2)||, x = 0 -> opt = sqrt(5)."""
    # vars (u, x); SOC constraint h - Gx = (u, x-1, 2) in K_soc
    c = [1.0, 0.0]
    A = [[0.0, 1.0]]
    b = [0.0]
    G = [[-1.0, 0.0], [0.0, -1.0], [0.0, 0.0]]
    h = [0.0, -1.0, 2.0]
    build_solve_check(c, A, b, G, h, [cones.EpiNormEucl(3)],
                      expect_obj=np.sqrt(5.0), **opts)


def test_infeasible_lp():
    """x >= 0, x1 + x2 = -1 is primal infeasible."""
    c = [1.0, 1.0]
    A = [[1.0, 1.0]]
    b = [-1.0]
    G = -np.eye(2)
    h = [0.0, 0.0]
    build_solve_check(c, A, b, G, h, [cones.Nonnegative(2)],
                      expect_status="PrimalInfeasible")


def test_dual_infeasible_lp():
    """min -x with x >= 0 only (unbounded below) is dual infeasible."""
    c = [-1.0]
    A = np.zeros((0, 1))
    b = np.zeros(0)
    G = [[-1.0]]
    h = [0.0]
    build_solve_check(c, A, b, G, h, [cones.Nonnegative(1)],
                      expect_status="DualInfeasible")


def test_dependent_equalities():
    """Duplicated equality rows are dropped by preprocessing
    (`nativesets.jl:5-10` inst_preproc)."""
    c = [-1.0, -1.0]
    A = [[1.0, 1.0], [1.0, 1.0]]
    b = [1.0, 1.0]
    G = -np.eye(2)
    h = [0.0, 0.0]
    build_solve_check(c, A, b, G, h, [cones.Nonnegative(2)], expect_obj=-1.0)


def test_inconsistent_equalities():
    c = [-1.0, -1.0]
    A = [[1.0, 1.0], [1.0, 1.0]]
    b = [1.0, 2.0]
    G = -np.eye(2)
    h = [0.0, 0.0]
    model = Model(c, A, b, G, h, [cones.Nonnegative(2)])
    solver = Solver()
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "PrimalInconsistent"


def test_init_use_indirect():
    """LSQR initial point (`process.jl:86-95,209-211` init_use_indirect):
    same solution as the QR path, no host QR of [A; G]."""
    rng = np.random.default_rng(11)
    A = 10 * rng.random((6, 15))
    b = A.sum(1)
    c = rng.random(15)
    model = Model(c, A, b, -np.eye(15), np.zeros(15),
                  [cones.Nonnegative(15)])
    s = Solver(preprocess=False, reduce=False, init_use_indirect=True,
               syssolver="symindef", fused=True)
    s.load(model)
    s.solve()
    assert s.get_status() == "Optimal"
    s2 = Solver(fused=True)
    s2.load(Model(c, A, b, -np.eye(15), np.zeros(15),
                  [cones.Nonnegative(15)]))
    s2.solve()
    assert abs(s.get_primal_obj() - s2.get_primal_obj()) < 1e-6 * (
        1 + abs(s2.get_primal_obj()))


def test_indirect_ill_conditioned():
    """GMRES convergence accounting in symindef_indirect
    (`symindef.jl:332-343`): a badly row-scaled LP (1e4 row-norm spread,
    rescale off so Ruiz doesn't mask it) must still produce usable
    directions — the restart-until-converged loop keeps the 3x3 residual
    below sqrt(eps) instead of silently returning a 40-iteration
    partial solve."""
    rng = np.random.default_rng(7)
    m, n = 6, 12
    A = 10 * rng.random((m, n)) * np.logspace(0, 4, m)[:, None]
    b = A.sum(axis=1)
    c = rng.random(n)
    s = build_solve_check(
        c, A, b, -np.eye(n), np.zeros(n), [cones.Nonnegative(n)],
        syssolver="symindef_indirect", preprocess=False, reduce=False,
        rescale=False, default_tol_relax=10000, tol_slow=1e-5,
        check_tol=1e-2)
    import scipy.optimize
    res = scipy.optimize.linprog(c, A_eq=A, b_eq=b, bounds=(0, None))
    assert abs(s.get_primal_obj() - res.fun) < 1e-3 * (1 + abs(res.fun))


def test_near_optimal_status():
    """NearOptimal relaxed termination: a strictly-slack SOC stalls at
    ~3e-8 relative gap with SlowProgress at tight tolerances (documented
    behavior matching the reference's thresholds); with near_factor the
    final iterate passes the relaxed optimality test and reports
    NearOptimal instead. near_factor=0 disables."""
    c = [1.0]
    G = np.array([[-1.0], [0.0], [-1.0]])
    h = [-1.0, 2.0, 0.0]
    cl = [cones.Nonnegative(1), cones.EpiNormEucl(2)]
    st = []
    for nf in (1000.0, 0.0):
        model = Model(c, np.zeros((0, 1)), np.zeros(0), G, h, cl)
        s = Solver(verbose=False, near_factor=nf, iter_limit=100)
        s.load(model)
        s.solve()
        st.append(s.get_status())
        assert abs(s.get_primal_obj() - 1.0) < 1e-6
    assert st == ["NearOptimal", "SlowProgress"]
