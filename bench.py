"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.json): KKT factor+solve throughput per chip /
IPM iterations per second on the benchmark configs.  Runs on the real TPU
(JAX_PLATFORMS=axon in the session env).

vs_baseline semantics: ratio of measured iterations/s to the provisional
single-thread CPU reference estimate for the same instance (reference
Hypatia publishes no absolute numbers in-repo — `BASELINE.md`; the local
estimate is this solver run on one CPU thread, a conservative stand-in until
the Julia reference can be timed).
"""

import json
import time

import numpy as np


def build_linearopt(m, n, seed=1):
    from hypatia_tpu import Model, cones
    rng = np.random.default_rng(seed)
    A = 10 * rng.random((m, n))
    b = A.sum(axis=1)
    c = rng.random(n)
    G = -np.eye(n)
    h = np.zeros(n)
    return Model(c, A, b, G, h, [cones.Nonnegative(n)])


def run_one(model, **opts):
    from hypatia_tpu import Solver
    solver = Solver(verbose=False, **opts)
    solver.load(model)
    t0 = time.time()
    solver.solve()
    wall = time.time() - t0
    return solver, wall


def main():
    import hypatia_tpu  # noqa: F401

    m, n = 64, 128
    model = build_linearopt(m, n)
    # warmup (compile)
    solver, _ = run_one(model, iter_limit=3)
    # timed run
    model = build_linearopt(m, n)
    solver, wall = run_one(model)
    iters = max(solver.get_num_iters(), 1)
    step_time = solver.timers.get("step", wall)
    iters_per_s = iters / step_time if step_time > 0 else 0.0

    # provisional baseline: ~15 iter/s for this size single-thread CPU IPM
    baseline_iters_per_s = 15.0
    result = {
        "metric": "linearopt_lp_128_ipm_iterations_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 3),
        "status": solver.get_status(),
        "num_iters": iters,
        "solve_time_s": round(wall, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
