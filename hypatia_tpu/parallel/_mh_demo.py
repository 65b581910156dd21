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
    args = ap.parse_args()

    from hypatia_tpu.parallel import multihost

    multihost.initialize_from_env()

    import jax

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
    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(out, f)
    print(json.dumps({"proc": jax.process_index(), "ok": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
