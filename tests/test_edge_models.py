"""Degenerate / boundary model-shape torture suite.

Native-API analog of the reference's MOI conformance edge cases
(`/root/reference/test/moi.jl:46-80`, `wrapper.jl:337-413`): objective
offsets, maximization via negation, duplicate/merged rows, fixed
variables, unconstrained variables, zero objectives, empty equality
blocks, single-variable/single-row shapes, and cone lists with many tiny
cones.
"""

import numpy as np
import pytest

from hypatia_tpu import Model, Solver, cones, solve
from tests.test_native import build_solve_check

_ZA = np.zeros((0, 1))
_ZB = np.zeros(0)


def test_obj_offset():
    """obj_offset is added to both primal and dual objectives
    (`Models.jl:23`, `wrapper.jl:146` MOI constant term)."""
    s = build_solve_check([1.0], _ZA, _ZB, [[-1.0]], [-1.0],
                          [cones.Nonnegative(1)], obj_offset=2.5,
                          expect_obj=3.5)
    assert abs(s.get_dual_obj() - 3.5) < 1e-7


def test_max_sense_by_negation():
    """MAX sense = negate c and obj_offset (the MOI wrapper's sense flip,
    `wrapper.jl:117-146`)."""
    # max x s.t. x <= 3  <->  min -x
    s = solve(Model([-1.0], _ZA, _ZB, [[1.0]], [3.0],
                    [cones.Nonnegative(1)], obj_offset=0.0), verbose=False)
    assert s.get_status() == "Optimal"
    assert abs(-s.get_primal_obj() - 3.0) < 1e-7


def test_fixed_variable():
    """A variable fixed by two (redundant) equalities."""
    c = [1.0, 1.0]
    A = [[1.0, 0.0], [2.0, 0.0], [0.0, 1.0]]
    b = [2.0, 4.0, 1.0]
    s = build_solve_check(c, A, b, -np.eye(2), np.zeros(2),
                          [cones.Nonnegative(2)], expect_obj=3.0)


def test_duplicate_inequality_rows():
    """The same inequality twice (MOI merges Nonnegative rows;
    the native form must tolerate literal duplicates)."""
    c = [-1.0]
    G = np.array([[1.0], [1.0], [-1.0]])
    h = [2.0, 2.0, 0.0]
    build_solve_check(c, _ZA, _ZB, G, h, [cones.Nonnegative(3)],
                      expect_obj=-2.0)


def test_no_equalities():
    build_solve_check([1.0], _ZA, _ZB, [[-1.0]], [-0.5],
                      [cones.Nonnegative(1)], expect_obj=0.5)


def test_zero_objective():
    """Pure feasibility problem (c = 0)."""
    s = build_solve_check([0.0], _ZA, _ZB, [[-1.0]], [-1.0],
                          [cones.Nonnegative(1)], expect_obj=0.0)
    assert s.get_x()[0] >= 1.0 - 1e-7


def test_single_row_single_var():
    build_solve_check([1.0], [[1.0]], [1.0], [[-1.0]], [0.0],
                      [cones.Nonnegative(1)], expect_obj=1.0)


def test_many_tiny_cones():
    """20 one-dimensional cones (stress cone grouping + index layout)."""
    n = 20
    rng = np.random.default_rng(0)
    c = rng.random(n)
    A = np.ones((1, n))
    b = [1.0]
    build_solve_check(c, A, b, -np.eye(n), np.zeros(n),
                      [cones.Nonnegative(1) for _ in range(n)],
                      expect_obj=float(c.min()))


def test_mixed_tiny_cones_unsorted():
    """Interleaved cone types exercise the sorting permutation layer."""
    # vars (t, x1, x2): min t s.t. t >= ||(x1, x2)||, x1 = 0.6, x2 >= 0.8
    c = [1.0, 0.0, 0.0]
    A = [[0.0, 1.0, 0.0]]
    b = [0.6]
    G = np.zeros((5, 3))
    G[0, 0] = -1.0   # SOC u
    G[1, 1] = -1.0   # SOC w1
    G[2, 2] = -1.0   # SOC w2
    G[3, 2] = 1.0    # x2 >= 0.8  ->  -0.8 + x2 >= 0
    G[4, 1] = 1.0    # slack row
    h = [0.0, 0.0, 0.0, -0.8, 2.0]
    build_solve_check(c, A, b, G, h,
                      [cones.EpiNormEucl(3), cones.Nonnegative(2)],
                      expect_obj=1.0)


def test_free_variable_in_objective_only():
    """A variable appearing in no cone row must be pinned by equalities
    (otherwise dual infeasible)."""
    c = [1.0, 1.0]
    A = [[0.0, 1.0]]
    b = [4.0]
    G = np.zeros((1, 2))
    G[0, 0] = -1.0
    build_solve_check(c, A, b, G, [0.0], [cones.Nonnegative(1)],
                      expect_obj=4.0)


def test_negative_obj_offset_infeasible_unaffected():
    """obj_offset must not perturb infeasibility detection."""
    model = Model([1.0], [[1.0]], [-1.0], [[-1.0]], [0.0],
                  [cones.Nonnegative(1)], obj_offset=100.0)
    s = Solver(verbose=False)
    s.load(model)
    s.solve()
    assert s.get_status() == "PrimalInfeasible"


def test_dense_b_scaling():
    """Large-magnitude data exercises Ruiz rescaling (`process.jl:13-60`)."""
    rng = np.random.default_rng(5)
    m, n = 4, 8
    A = 1e4 * rng.random((m, n))
    b = A.sum(axis=1)
    c = 1e-3 * rng.random(n)
    s1 = build_solve_check(c, A, b, -np.eye(n), np.zeros(n),
                           [cones.Nonnegative(n)])
    import scipy.optimize
    ref = scipy.optimize.linprog(c, A_eq=A, b_eq=b, bounds=(0, None))
    assert abs(s1.get_primal_obj() - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_equality_only_point_problem():
    """All variables pinned by equalities; conic block checks feasibility."""
    c = [1.0, 2.0]
    A = np.eye(2)
    b = [0.3, 0.7]
    build_solve_check(c, A, b, -np.eye(2), np.zeros(2),
                      [cones.Nonnegative(2)],
                      expect_obj=0.3 + 2 * 0.7)
