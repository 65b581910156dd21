"""Run only the missing round-2 sweep stages (batch32, banded200).

The profiled single-instance stages already completed in a prior run
(benchmarks/round2_tpu_results.json); re-running them with MEASURE_PROFILE
recompiles ~20 program shapes and blows the wall-clock budget on the
tunneled TPU. Run from the repo root.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.round2_tpu_measure import record  # noqa: E402


def main():
    import examples
    from hypatia_tpu.parallel import solve_batch

    def run_batch(nb=32, m=64, n=128):
        models = [examples.linearopt.build(m=m, n=n, seed=s)
                  for s in range(nb)]
        warm = [examples.linearopt.build(m=m, n=n, seed=1000 + s)
                for s in range(nb)]
        t0 = time.time()
        solve_batch(warm, solver_options=dict(default_tol_relax=10))
        compile_s = time.time() - t0
        t0 = time.time()
        res = solve_batch(models, solver_options=dict(default_tol_relax=10))
        wall = time.time() - t0
        tot = sum(r["num_iters"] for r in res)
        return dict(batch=nb, optimal=sum(r["status"] == "Optimal"
                                          for r in res),
                    total_iters=tot, solve_s=round(wall, 3),
                    agg_iters_per_s=round(tot / wall, 1),
                    first_call_s=round(compile_s, 1))

    chunk = os.environ.get("HYPATIA_TPU_BATCH_CHUNK", "")
    key = f"batch32_chunk{chunk}" if chunk else "batch32"
    record(key, run_batch())

    if os.environ.get("SKIP_BANDED"):
        return

    def run_banded(side=200, band=4, block=16):
        import numpy as np
        from hypatia_tpu import Model, Solver, cones
        from hypatia_tpu.cones.psdbanded import band_pattern

        rows, cols = band_pattern(side, band)
        diag = (rows == cols).astype(float)

        def one(seed):
            rng = np.random.default_rng(seed)
            cone = cones.PosSemidefTriBanded(side, band, block=block)
            avals = rng.standard_normal(cone.dim)
            m = Model(-avals, diag[None, :], np.array([1.0]),
                      -np.eye(cone.dim), np.zeros(cone.dim), [cone])
            s = Solver(fused=True, iter_limit=100, default_tol_relax=10)
            s.load(m)
            t0 = time.time()
            s.solve()
            return s, time.time() - t0

        t0 = time.time()
        one(0)
        compile_s = time.time() - t0
        s, wall = one(1)
        st = s.timers.get("step", wall)
        return dict(side=side, band=band, block=block,
                    status=s.get_status(), iters=s.get_num_iters(),
                    obj=float(s.get_primal_obj()),
                    iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2),
                    first_call_s=round(compile_s, 1))

    try:
        record("banded200", run_banded())
    except Exception as e:  # noqa: BLE001
        record("banded200", {"error": str(e)})


if __name__ == "__main__":
    main()
