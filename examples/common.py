"""Example-instance harness: build, solve, check certificates, report perf.

Mirrors the reference's `examples/common_native.jl:16-52` (run_instance) and
`examples/common.jl:17-54` (certificate violation checks) plus the perf
record schema of `examples/setup.jl:5-52`.
"""

import time

import numpy as np


def certificate_violations(model, solver):
    """Max violations of the conic optimality/infeasibility certificate."""
    status = solver.get_status()
    x, y, z, s = (solver.get_x(), solver.get_y(), solver.get_z(),
                  solver.get_s())
    c, A, b, G, h = model.c, model.A, model.b, model.G, model.h
    viols = {}
    # normalize residuals like the solver's convergence tests
    # (`Solvers.jl:485-528`): by 1 + the inf-norm of the relevant data
    sb = 1.0 + float(np.max(np.abs(b), initial=0.0))
    sh = 1.0 + float(np.max(np.abs(h), initial=0.0))
    sc = 1.0 + float(np.max(np.abs(c), initial=0.0))
    if status == "Optimal":
        viols["x"] = float(np.max(np.abs(A @ x - b), initial=0.0)) / sb
        viols["z"] = float(np.max(np.abs(G @ x + s - h), initial=0.0)) / sh
        viols["y"] = float(np.max(np.abs(G.T @ z + A.T @ y + c),
                                  initial=0.0)) / sc
        pobj = float(c @ x) + model.obj_offset
        dobj = float(-b @ y - h @ z) + model.obj_offset
        viols["compl"] = abs(float(s @ z)) / (1 + abs(pobj) + abs(dobj))
        viols["obj_gap"] = abs(pobj - dobj) / (1 + abs(pobj) + abs(dobj))
    elif status == "PrimalInfeasible":
        viols["y"] = float(np.max(np.abs(G.T @ z + A.T @ y), initial=0.0))
        viols["dobj_sign"] = float(-(-b @ y - h @ z))  # should be < 0 viol
    elif status == "DualInfeasible":
        viols["x"] = float(np.max(np.abs(A @ x), initial=0.0))
        viols["z"] = float(np.max(np.abs(G @ x + s), initial=0.0))
    return viols


def run_instance(family_module, params, solver_options=None, tol=1e-7):
    """Build and solve one instance; return a perf record dict."""
    from hypatia_tpu import Solver

    solver_options = dict(solver_options or {})
    t0 = time.time()
    model = family_module.build(**params)
    build_time = time.time() - t0

    solver = Solver(**solver_options)
    solver.load(model)
    t0 = time.time()
    solver.solve()
    solve_time = time.time() - t0

    viols = certificate_violations(model, solver)
    record = {
        "family": family_module.__name__,
        "params": params,
        "status": solver.get_status(),
        "num_iters": solver.get_num_iters(),
        "primal_obj": solver.get_primal_obj(),
        "dual_obj": solver.get_dual_obj(),
        "build_time": build_time,
        "solve_time": solve_time,
        "n": model.n, "p": model.p, "q": model.q, "nu": model.nu,
        "num_cones": len(model.cones),
        "viols": viols,
        "timers": dict(solver.timers),
        "max_viol": max(viols.values(), default=0.0),
    }
    return record
