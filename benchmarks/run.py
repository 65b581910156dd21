"""Benchmark runner: sweep example instance sets and emit a CSV.

Parity with the reference benchmark drivers (`benchmarks/natvsext/run.jl`,
`benchmarks/stepper/run.jl`) and the perf DataFrame schema
(`examples/setup.jl:5-52`): per-instance status, iterations, objectives,
certificate violations, solver timers, and model statistics.

Usage:
    python benchmarks/run.py [--set minimal|fast|bench] [--out results.csv]
    python benchmarks/run.py --steppers     # stepper config sweep
"""

import argparse
import csv
import json
import sys
import time


STEPPER_CONFIGS = {
    # reference stepper benchmark configs (`benchmarks/stepper/run.jl:30-37`)
    "basic": dict(stepper="predorcent", use_adjustment=False,
                  use_curve_search=False),
    "toa": dict(stepper="predorcent", use_adjustment=True,
                use_curve_search=False),
    "curve": dict(stepper="predorcent", use_adjustment=True,
                  use_curve_search=True),
    "comb": dict(stepper="combined"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--set", default="minimal",
                        choices=["minimal", "fast", "bench"])
    parser.add_argument("--out", default="bench_results.csv")
    parser.add_argument("--steppers", action="store_true",
                        help="sweep stepper configs (comb/curve/toa/basic)")
    parser.add_argument("--families", default="",
                        help="comma-separated subset of families")
    args = parser.parse_args()

    import examples
    from examples.common import run_instance

    setname = {"minimal": "MINIMAL", "fast": "FAST", "bench": "BENCH"}[
        args.set]
    fams = (args.families.split(",") if args.families
            else list(examples.FAMILIES))

    configs = (STEPPER_CONFIGS if args.steppers else {"comb": {}})

    import jax

    fieldnames = ["family", "params", "config", "status", "iters",
                  "primal_obj", "dual_obj", "max_viol", "build_time",
                  "solve_time", "n", "p", "q", "nu", "num_cones"]
    out_f = open(args.out, "w", newline="")
    writer = csv.DictWriter(out_f, fieldnames=fieldnames)
    writer.writeheader()

    rows = []
    for fam in fams:
        mod = examples.FAMILIES[fam]
        instances = getattr(mod, setname, [])
        for params in instances:
            for cfg_name, cfg in configs.items():
                opts = dict(default_tol_relax=10, **cfg)
                t0 = time.time()
                try:
                    rec = run_instance(mod, params, solver_options=opts)
                    row = {
                        "family": fam,
                        "params": json.dumps(params),
                        "config": cfg_name,
                        "status": rec["status"],
                        "iters": rec["num_iters"],
                        "primal_obj": rec["primal_obj"],
                        "dual_obj": rec["dual_obj"],
                        "max_viol": rec["max_viol"],
                        "build_time": round(rec["build_time"], 4),
                        "solve_time": round(rec["solve_time"], 4),
                        "n": rec["n"], "p": rec["p"], "q": rec["q"],
                        "nu": rec["nu"], "num_cones": rec["num_cones"],
                    }
                except Exception as e:
                    row = {"family": fam, "params": json.dumps(params),
                           "config": cfg_name,
                           "status": f"ERROR: {type(e).__name__}",
                           "solve_time": round(time.time() - t0, 4)}
                rows.append(row)
                writer.writerow(row)
                out_f.flush()
                if len(rows) % 8 == 0:
                    # XLA compile state accumulates across many distinct
                    # programs and can exhaust the compiler; drop caches
                    jax.clear_caches()
                print(f"[{fam} {params} {cfg_name}] "
                      f"{row['status']} {row.get('iters', '')} "
                      f"{row.get('solve_time')}s", file=sys.stderr,
                      flush=True)

    out_f.close()
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
