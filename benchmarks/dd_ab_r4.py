"""Round-4: Pallas dd kernel tight-tolerance A/B on TPU (VERDICT r3 weak
item 4: the dd factorization was default-on but on-chip validated only at
default_tol_relax=10).

Solves linearopt (LP, Schur factorization is the iteration) and
nearestpsd (matrix-cone oracle chain) at BOTH the example-test relaxation
(10) and TIGHT tolerances (relax=1, i.e. tol_feas ~ 1.5e-8), with the dd
kernel on (default) and off (HYPATIA_TPU_NO_PALLAS_DD=1), in separate
subprocesses so the env switch is clean.

Run from repo root: python benchmarks/dd_ab_r4.py
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SNIPPET = r"""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import examples
from hypatia_tpu import Solver

def run(mod, params, relax):
    model = mod.build(**params)
    warm = mod.build(**{**params, "seed": params.get("seed", 1) + 1}
                     if "seed" in params else params)
    for mdl, timed in ((warm, False), (model, True)):
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=relax)
        s.load(mdl)
        t0 = time.time()
        s.solve()
        wall = time.time() - t0
    st = s.timers.get("step", wall)
    return dict(status=s.get_status(), iters=s.get_num_iters(),
                obj=s.get_primal_obj(),
                iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))

out = {}
for relax in (10, 1):
    out[f"linearopt_relax{relax}"] = run(
        examples.linearopt, dict(m=128, n=256, seed=1), relax)
    out[f"nearestpsd_relax{relax}"] = run(
        examples.nearestpsd, dict(side=30), relax)
print("RESULT " + json.dumps(out), flush=True)
"""


def main():
    results = {}
    for label, env_extra in (("dd_on", {}),
                             ("dd_off", {"HYPATIA_TPU_NO_PALLAS_DD": "1"})):
        env = dict(os.environ)
        env.update(env_extra)
        print(f"[dd_ab] {label} ...", file=sys.stderr, flush=True)
        p = subprocess.run([sys.executable, "-u", "-c", _SNIPPET],
                           capture_output=True, text=True, env=env,
                           timeout=3000)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if line:
            results[label] = json.loads(line[-1][7:])
        else:
            results[label] = {"error": (p.stderr or "")[-500:]}
        print(f"[dd_ab] {label}: {results[label]}", file=sys.stderr,
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
