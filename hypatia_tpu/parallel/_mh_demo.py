"""Multi-process validation worker: batched LP solve over a global mesh.

Run under ``hypatia_tpu.parallel.launch`` (one JAX controller per fake
host).  Every process builds the SAME instance batch deterministically,
the batch axis is sharded over the global (hosts x local-devices) hybrid
mesh, and process 0 writes the results JSON for the parent to compare
against a single-process solve.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--out", default="/tmp/mh_demo.json")
    ap.add_argument("--time-iters", action="store_true",
                    help="also time aggregate iterations/s on a fresh "
                         "batch (scaling-efficiency methodology)")
    args = ap.parse_args()

    from hypatia_tpu.parallel import multihost

    multihost.initialize_from_env()

    import jax

    # persistent compile cache: the batched fused programs are compile-
    # heavy, and the efficiency measurement (--time-iters) re-runs this
    # worker at several process counts on the same structures
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.getcwd(), ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import examples
    from hypatia_tpu.parallel import solve_batch

    mesh = multihost.hybrid_mesh()
    models = [examples.linearopt.build(m=args.m, n=args.n, seed=s)
              for s in range(args.nb)]
    res = solve_batch(models, solver_options=dict(default_tol_relax=10),
                      mesh=mesh)
    out = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "mesh_shape": dict(mesh.shape),
        "results": [{"status": r["status"], "num_iters": r["num_iters"],
                     "primal_obj": r["primal_obj"],
                     "dual_obj": r["dual_obj"]} for r in res],
    }
    if args.time_iters:
        # scaling-efficiency measurement (north-star metric methodology,
        # BASELINE.json "iterations/s scaling efficiency >=70% at 2+
        # hosts"): re-solve a FRESH batch of identical structure (compile
        # cache warm from the run above) and report aggregate device
        # iterations/s. The parent runs this at 1 and N processes with
        # the same PER-PROCESS batch (weak scaling, the serving shape)
        # and computes efficiency = rate(N) / (N * rate(1)).
        import time

        from hypatia_tpu.parallel import batch as pbatch

        fresh = [examples.linearopt.build(m=args.m, n=args.n, seed=1000 + s)
                 for s in range(args.nb)]
        t0 = time.time()
        res2 = solve_batch(fresh, solver_options=dict(default_tol_relax=10),
                           mesh=mesh)
        wall = time.time() - t0
        tot = sum(r["num_iters"] for r in res2)
        out["timing"] = {
            "total_iters": tot,
            "wall_s": round(wall, 4),
            "device_solve_s": round(pbatch.LAST_TIMERS.get("solve_s", wall),
                                    4),
            "agg_iters_per_s_wall": round(tot / wall, 2),
            "agg_iters_per_s_device": round(
                tot / max(pbatch.LAST_TIMERS.get("solve_s", wall), 1e-9), 2),
        }
    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(out, f)
    print(json.dumps({"proc": jax.process_index(), "ok": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
