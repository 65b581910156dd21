"""Float32 end-to-end smoke tests at relaxed tolerances.

Parity: the reference is generic over T with Float32 tested
(`test/runnativetests.jl:20-28`). f32 default tolerances derive from
eps(f32)^powers (utils/dtypes.py), i.e. tol_feas ~ 3e-4.
"""

import numpy as np
import pytest

from hypatia_tpu import Model, Solver, cones


def _solve(model, relax=3, **opts):
    s = Solver(verbose=False, dtype=np.float32, default_tol_relax=relax,
               iter_limit=100, **opts)
    s.load(model)
    s.solve()
    return s


def test_f32_lp():
    rng = np.random.default_rng(0)
    m, n = 8, 16
    A = 10 * rng.random((m, n))
    b = A.sum(axis=1)
    c = rng.random(n)
    model = Model(c, A, b, -np.eye(n), np.zeros(n), [cones.Nonnegative(n)])
    s = _solve(model)
    assert s.get_status() == "Optimal"
    import scipy.optimize
    ref = scipy.optimize.linprog(c, A_eq=A, b_eq=b, bounds=(0, None)).fun
    assert abs(s.get_primal_obj() - ref) < 1e-3 * (1 + abs(ref))


def test_f32_socp():
    rng = np.random.default_rng(1)
    n = 6
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    c = -rng.random(n)
    A = np.ones((1, n))
    b = np.array([1.0])
    G = np.vstack([-np.eye(n), np.zeros((1, n)), -F])
    h = np.zeros(2 * n + 1)
    h[n] = 1.5
    model = Model(c, A, b, G, h,
                  [cones.Nonnegative(n), cones.EpiNormEucl(1 + n)])
    s = _solve(model)
    assert s.get_status() == "Optimal"
    ref = _solve_f64(model)
    assert abs(s.get_primal_obj() - ref) < 1e-3 * (1 + abs(ref))


def test_f32_psd():
    rng = np.random.default_rng(2)
    side = 3
    sl = side * (side + 1) // 2
    C = rng.standard_normal((side, side))
    C = (C + C.T) / 2
    from hypatia_tpu.ops.svec import smat_to_svec
    import jax.numpy as jnp

    c_svec = np.asarray(smat_to_svec(jnp.asarray(C)))
    tr_row = np.asarray(smat_to_svec(jnp.asarray(np.eye(side))))
    # min <C, X> s.t. tr X = 1, X PSD
    model = Model(c_svec, tr_row[None, :], np.array([1.0]),
                  -np.eye(sl), np.zeros(sl), [cones.PosSemidefTri(sl)])
    s = _solve(model)
    assert s.get_status() == "Optimal"
    lam_min = np.linalg.eigvalsh(C).min()
    assert abs(s.get_primal_obj() - lam_min) < 1e-3 * (1 + abs(lam_min))


def test_f32_hypoperlog():
    # max sum log x s.t. sum x = 1  ->  entropy-style HypoPerLog instance
    n = 4
    c = np.concatenate([[-1.0], np.zeros(1 + n)])
    A = np.zeros((2, 2 + n))
    A[0, 1] = 1.0  # v = 1
    A[1, 2:] = 1.0  # sum w = 1
    b = np.array([1.0, 1.0])
    G = -np.eye(2 + n)
    h = np.zeros(2 + n)
    model = Model(c, A, b, G, h, [cones.HypoPerLog(2 + n)])
    s = _solve(model, relax=1)
    assert s.get_status() == "Optimal"
    ref = -n * np.log(1.0 / n)
    assert abs(-s.get_primal_obj() - (-ref)) < 1e-2


def _solve_f64(model):
    s = Solver(verbose=False, default_tol_relax=10, iter_limit=100)
    s.load(model)
    s.solve()
    return s.get_primal_obj()


def test_f32_wsos():
    # univariate quartic polymin in f32 (WSOSInterpNonnegative oracles)
    import examples

    model = examples.polymin.build(poly="univariate_quartic")
    s = _solve(model, relax=1)
    assert s.get_status() == "Optimal"
    assert abs(s.get_primal_obj() - 1.0) < 1e-2


def test_f32_sepspectral_matrix():
    # min u s.t. v=1, W=W0 with h=-log -> u* = -logdet(W0)
    import jax.numpy as jnp
    from hypatia_tpu.ops.svec import smat_to_svec

    rng = np.random.default_rng(7)
    M = rng.standard_normal((2, 2))
    W0 = M @ M.T + 0.5 * np.eye(2)
    opt = -float(np.linalg.slogdet(W0)[1])
    G = np.zeros((5, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], np.asarray(smat_to_svec(jnp.asarray(W0)))])
    model = Model([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                  [cones.EpiPerSepSpectralMatrix(cones.NegLogSSF(), 2)])
    s = _solve(model, relax=3)
    assert s.get_status() == "Optimal"
    assert abs(s.get_primal_obj() - opt) < 1e-2 * (1 + abs(opt))
