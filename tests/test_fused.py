"""Fused vs host-loop solve equivalence."""

import numpy as np

from hypatia_tpu import Model, Solver, cones


def _model(seed=3):
    rng = np.random.default_rng(seed)
    m, n = 6, 12
    A = 10 * rng.random((m, n))
    b = A.sum(axis=1)
    c = rng.random(n)
    return Model(c, A, b, -np.eye(n), np.zeros(n), [cones.Nonnegative(n)])


def test_fused_matches_unfused():
    s1 = Solver(fused=True)
    s1.load(_model())
    s1.solve()
    s2 = Solver(fused=False)
    s2.load(_model())
    s2.solve()
    assert s1.get_status() == s2.get_status() == "Optimal"
    assert s1.get_num_iters() == s2.get_num_iters()
    assert abs(s1.get_primal_obj() - s2.get_primal_obj()) < 1e-10
    np.testing.assert_allclose(s1.get_x(), s2.get_x(), rtol=1e-8, atol=1e-10)


def test_fused_infeasible_status():
    c = [1.0, 1.0]
    A = [[1.0, 1.0]]
    b = [-1.0]
    model = Model(c, A, b, -np.eye(2), [0.0, 0.0], [cones.Nonnegative(2)])
    s = Solver(fused=True)
    s.load(model)
    s.solve()
    assert s.get_status() == "PrimalInfeasible"


def test_fused_iteration_limit():
    s = Solver(fused=True, iter_limit=2)
    s.load(_model())
    s.solve()
    assert s.get_status() == "IterationLimit"
    assert s.get_num_iters() == 2


def test_shift_sched_warm_start():
    """Alpha-schedule warm start (`combined.jl:173-176`): shift_sched > 0
    searches a window starting near the previous accepted alpha, with a
    full-schedule fallback; the solve must still reach the same optimum."""
    base = Solver(fused=True)
    base.load(_model())
    base.solve()
    for fused in (True, False):
        s = Solver(fused=fused, shift_sched=3)
        s.load(_model())
        s.solve()
        assert s.get_status() == "Optimal"
        assert abs(s.get_primal_obj() - base.get_primal_obj()) < 1e-7 * (
            1 + abs(base.get_primal_obj()))


def test_profile_phases_smoke():
    """profile_phases returns the per-phase breakdown used by bench.py
    (upsys/upfact/uprhs/getdir/search + kkt_ms); values nonneg/finite."""
    import numpy as np
    from hypatia_tpu import Model, Solver, cones
    from hypatia_tpu.solvers.profile import profile_phases

    rng = np.random.default_rng(0)
    A = 10 * rng.random((6, 15))
    model = Model(rng.random(15), A, A.sum(1), -np.eye(15), np.zeros(15),
                  [cones.Nonnegative(15)])
    s = Solver(fused=True, default_tol_relax=10)
    s.load(model)
    s.solve()
    assert s.get_status() == "Optimal"
    res = profile_phases(s, n=3)
    for key in ("upsys_ms", "upfact_ms", "uprhs_ms", "getdir_ms",
                "search_ms", "kkt_ms", "total_accounted_ms"):
        assert key in res and np.isfinite(res[key]) and res[key] >= 0.0
