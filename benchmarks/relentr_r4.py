"""Round-4: quantum relative-entropy cone on-chip re-validation (VERDICT
r3 item 3): the flagship exotic cone had no round-3 on-chip evidence and
its factor path changed after the last measurement (9cc66d5).

Runs relentrentanglement on the current backend:
  - na=2 nb=2 (side 4, svec dim 10) at default_tol_relax=10 AND relax=1
    (tight: tol_feas ~ 1.5e-8) — probes the f64-eigh accuracy floor;
  - na=3 nb=3 (side 9, svec dim 45) at relax=10 — a size where the
    Daleckii-Krein divided differences + eigh_refined dominate, on-chip.

Parity bar: `/root/reference/src/Cones/epitrrelentropytri.jl:149-289`
(oracles), `/root/reference/examples/relentrentanglement/JuMP.jl`.

Run from repo root: python benchmarks/relentr_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    # script-mode only (see manycone_r4.py round-5 incident note)
    _p = os.environ.get("JAX_PLATFORMS")
    if _p:  # sitecustomize pins axon; honor an explicit platform override
        jax.config.update("jax_platforms", _p.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import examples
from hypatia_tpu import Solver


def run(params, relax, iter_limit=200):
    model = examples.relentrentanglement.build(**params)
    warm = examples.relentrentanglement.build(
        **{**params, "seed": params.get("seed", 1) + 1})
    for mdl, timed in ((warm, False), (model, True)):
        s = Solver(verbose=False, fused=True, iter_limit=iter_limit,
                   default_tol_relax=relax)
        s.load(mdl)
        t0 = time.time()
        s.solve()
        wall = time.time() - t0
    st = s.timers.get("step", wall)
    return dict(status=s.get_status(), iters=s.get_num_iters(),
                obj=float(s.get_primal_obj()), solve_s=round(wall, 3),
                iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    out = {"backend": jax.default_backend()}
    jobs = [
        ("na2nb2_relax10", dict(na=2, nb=2), 10),
        ("na2nb2_relax1", dict(na=2, nb=2), 1),
        ("na3nb3_relax10", dict(na=3, nb=3), 10),
    ]
    for name, params, relax in jobs:
        t0 = time.time()
        try:
            out[name] = run(params, relax)
        except Exception as e:  # noqa: BLE001
            out[name] = {"status": f"ERROR: {type(e).__name__}: {e}"}
        out[name]["wall_s"] = round(time.time() - t0, 1)
        print(f"{name}: {out[name]}", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
