"""CBLIB-style CBF sweep: parse + solve the 10-instance local set (plus
the reference-vendored expdesign instance when present) and emit a CSV.

Parity: the reference stepper benchmark's CBLIB leg
(`benchmarks/stepper/run.jl:22-44`, instance list
`benchmarks/stepper/README.md:12-15` — those instances need network
downloads, unavailable here; benchmarks/cblib_local.py generates a
domain-diverse local equivalent).

Usage: python benchmarks/cblib_sweep.py [--out cblib_results.csv]
"""

import argparse
import csv
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks/cblib_results.csv")
    parser.add_argument("--dir", default="benchmarks/cblib_local")
    args = parser.parse_args()

    import jax

    if jax.default_backend() not in ("cpu",) and "--tpu" not in sys.argv:
        pass  # run wherever invoked; compile cache helps on TPU
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.cblib_local import write_all, write_midsize
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    paths = write_all(args.dir)
    # mid-size synthetic namesakes of the reference's 10-instance CBLIB
    # protocol list (no egress: real files are not downloadable here)
    paths += write_midsize(args.dir)
    vendored = ("/root/reference/examples/CBLIB/cblib_data/"
                "expdesign_D_8_4.cbf.gz")
    if os.path.exists(vendored):
        paths.append(vendored)

    rows = []
    for path in paths:
        name = os.path.basename(path).replace(".cbf.gz", "").replace(
            ".cbf", "")
        t0 = time.time()
        try:
            model = read_cbf(path)
            solver = Solver(verbose=False, fused=True, iter_limit=300,
                            default_tol_relax=10)
            solver.load(model)
            solver.solve()
            rows.append({
                "instance": name, "status": solver.get_status(),
                "iters": solver.get_num_iters(),
                "primal_obj": solver.get_primal_obj(),
                "dual_obj": solver.get_dual_obj(),
                "n": model.n, "p": model.p, "q": model.q,
                "solve_s": round(time.time() - t0, 3),
            })
        except Exception as e:  # noqa: BLE001
            rows.append({"instance": name,
                         "status": f"ERROR: {type(e).__name__}: {e}",
                         "iters": 0, "primal_obj": float("nan"),
                         "dual_obj": float("nan"), "n": 0, "p": 0, "q": 0,
                         "solve_s": round(time.time() - t0, 3)})
        print(rows[-1], file=sys.stderr, flush=True)

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    n_opt = sum(r["status"] == "Optimal" for r in rows)
    print(f"{n_opt}/{len(rows)} Optimal -> {args.out}")
    return 0 if n_opt >= 8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
