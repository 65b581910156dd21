"""One-shot round-2 TPU measurement sweep.

Runs, on the real chip (run from the repo root):
  1. single-instance linearopt + doptimaldesign it/s (blocked kernels are
     scoped to vmapped contexts, so the line search uses them; A/B the
     whole dispatch with HYPATIA_TPU_NO_BLOCKED=1 in a second process)
  2. batch32 LP aggregate it/s (chunked host loop)
  3. optional fused batched while_loop attempt (HYPATIA_TPU_BATCH_FUSED=1)
  4. per-phase profile of linearopt/doptimaldesign (BENCH_PROFILE analog)

Writes benchmarks/round2_tpu_results.json. Uses the persistent compile
cache. Designed to be restartable: each stage appends as it completes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.path.join(os.path.dirname(__file__), "round2_tpu_results.json")


def record(key, value):
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data[key] = value
    json.dump(data, open(OUT, "w"), indent=1)
    print(f"[measure] {key}: {value}", flush=True)


def run_single(mod, params, profile=False, relax=10):
    from hypatia_tpu import Solver

    def one(seed_shift):
        p = dict(params)
        if "seed" in p:
            p["seed"] = p["seed"] + seed_shift
        model = mod.build(**p)
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=relax)
        s.load(model)
        t0 = time.time()
        s.solve()
        return s, time.time() - t0

    one(0)  # warm compile
    s, wall = one(1)
    st = s.timers.get("step", wall)
    out = dict(status=s.get_status(), iters=s.get_num_iters(),
               obj=float(s.get_primal_obj()),
               iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))
    if profile:
        from hypatia_tpu.solvers.profile import profile_phases

        try:
            out["phases"] = profile_phases(s)
        except Exception as e:  # noqa: BLE001
            out["phases"] = {"error": str(e)}
    return out


def main():
    import examples
    from hypatia_tpu.parallel import solve_batch

    profile = bool(os.environ.get("MEASURE_PROFILE"))
    record("env", dict(
        no_blocked=os.environ.get("HYPATIA_TPU_NO_BLOCKED", ""),
        batch_fused=os.environ.get("HYPATIA_TPU_BATCH_FUSED", ""),
        backend=jax.default_backend()))

    record("linearopt", run_single(
        examples.linearopt, dict(m=128, n=256, seed=1), profile=profile))
    record("doptimaldesign", run_single(
        examples.doptimaldesign,
        dict(q=10, p=30, n=60, n_max=6, use_logdet=True), profile=profile))

    def run_batch(nb=32, m=64, n=128):
        models = [examples.linearopt.build(m=m, n=n, seed=s)
                  for s in range(nb)]
        warm = [examples.linearopt.build(m=m, n=n, seed=1000 + s)
                for s in range(nb)]
        solve_batch(warm, solver_options=dict(default_tol_relax=10))
        t0 = time.time()
        res = solve_batch(models, solver_options=dict(default_tol_relax=10))
        wall = time.time() - t0
        tot = sum(r["num_iters"] for r in res)
        return dict(batch=nb, optimal=sum(r["status"] == "Optimal"
                                          for r in res),
                    total_iters=tot, solve_s=round(wall, 3),
                    agg_iters_per_s=round(tot / wall, 1))

    record("batch32", run_batch())

    # scan-form banded PSD cone: compile cost O(1) in side; the dense impl
    # at this size would Cholesky/invert a 200x200 per oracle call
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
        one(0)  # compile
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
