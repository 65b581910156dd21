"""Round-4: schur_acc_solve A/B on-chip (chol vs inv_corr), small and
MXU-scale LP. The r4 bench showed m=128 regress 214 -> 79 it/s with
inv_corr as accelerator default while the 1k config barely moved —
this isolates the refinement-correction solve's true cost per scale.

Run from repo root: python -u benchmarks/accsolve_ab_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    # script-mode only: the session env pins JAX_PLATFORMS=axon, so doing
    # this at import time would move an importing caller's run onto the
    # single-client TPU (see manycone_r4.py round-5 incident note)
    _p = os.environ.get("JAX_PLATFORMS")
    if _p:
        jax.config.update("jax_platforms", _p.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import examples
from hypatia_tpu import Solver


def run(params, acc):
    mod = examples.linearopt
    model = mod.build(**params)
    warm = mod.build(**{**params, "seed": 2})
    for mdl in (warm, model):
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=10, schur_acc_solve=acc)
        s.load(mdl)
        t0 = time.time()
        s.solve()
        wall = time.time() - t0
    st = s.timers.get("step", wall)
    return dict(status=s.get_status(), iters=s.get_num_iters(),
                iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2),
                step_s=round(st, 4))


def main():
    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    out = {}
    for name, params in (("lp128", dict(m=128, n=256)),
                         ("lp1k", dict(m=1000, n=2000))):
        for acc in ("inv_corr", "chol"):
            t0 = time.time()
            try:
                row = run(params, acc)
            except Exception as e:  # noqa: BLE001
                row = {"status": f"ERROR: {type(e).__name__}: {e}"}
            row["wall_s"] = round(time.time() - t0, 1)
            out[f"{name}_{acc}"] = row
            print(f"{name} {acc}: {row}", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
