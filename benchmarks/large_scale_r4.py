"""Round-4 MXU-scale configs across cone families (VERDICT r3 item 2):
record it/s vs the single-thread CPU proxy at identical sizes for non-LP
families, per the reference benchmark protocol
(`/root/reference/benchmarks/natvsext/run.jl:27-58`).

Configs: linearopt m=1k (the primary), doptimaldesign q=100 (logdet,
Schur dim 300), nearestpsd side=100 (PSD svec dim 5050), polymin
goldsteinprice halfdeg=9 (WSOS, interp dim 190 x 2 Lambda blocks).

TPU numbers run in-process; CPU proxies run in single-thread-pinned
subprocesses (same protocol as bench.py). SKIP_CPU=1 to skip proxies,
CONFIGS=a,b to subset.

Run from repo root: python benchmarks/large_scale_r4.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = {
    "linearopt_1k": ("linearopt", dict(m=1000, n=2000)),
    "doptimaldesign_q100": ("doptimaldesign",
                            dict(q=100, p=300, n=600, n_max=60,
                                 use_logdet=True)),
    "nearestpsd_100": ("nearestpsd", dict(side=100)),
    "polymin_gp9": ("polymin", dict(poly="goldsteinprice", halfdeg=9)),
}

_SNIPPET = r"""
import os, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_multi_thread_eigen=false"
    + " intra_op_parallelism_threads=1").strip()
os.environ["OMP_NUM_THREADS"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import examples
from hypatia_tpu import Solver
fam, params = %r, %r
mod = getattr(examples, fam)
def run(seed):
    p = dict(params); p["seed"] = seed
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(mod.build(**p))
    s.solve()
    return s
run(2)
s = run(1)
step = s.timers.get("step", 1e9)
print(json.dumps({"status": s.get_status(), "iters": s.get_num_iters(),
                  "step_s": round(step, 3),
                  "iters_per_s": round(s.get_num_iters()/max(step,1e-9), 3)}))
"""


def cpu_baseline(fam, params, timeout=3600):
    out = subprocess.run([sys.executable, "-c", _SNIPPET % (fam, params)],
                         capture_output=True, text=True, timeout=timeout)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    import examples
    from hypatia_tpu import Solver

    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    names = os.environ.get("CONFIGS", ",".join(CONFIGS)).split(",")
    do_cpu = not os.environ.get("SKIP_CPU")
    results = {}
    for name in names:
        fam, params = CONFIGS[name]
        mod = getattr(examples, fam)
        t0 = time.time()
        try:
            wp = dict(params)
            wp["seed"] = 2
            ws = Solver(verbose=False, fused=True, iter_limit=200,
                        default_tol_relax=10)
            ws.load(mod.build(**wp))
            ws.solve()
            s = Solver(verbose=False, fused=True, iter_limit=200,
                       default_tol_relax=10)
            s.load(mod.build(**dict(params, seed=1)))
            s.solve()
            step = s.timers.get("step", 1e9)
            row = {"status": s.get_status(), "iters": s.get_num_iters(),
                   "step_s": round(step, 3),
                   "iters_per_s": round(
                       s.get_num_iters() / max(step, 1e-9), 2),
                   "wall_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"}
        print(f"{name} tpu: {row}", flush=True)
        if do_cpu and "iters_per_s" in row:
            try:
                cb = cpu_baseline(fam, dict(params))
                row["cpu_1t"] = cb
                row["vs_cpu_1t"] = round(
                    row["iters_per_s"] / max(cb["iters_per_s"], 1e-9), 2)
            except Exception as e:  # noqa: BLE001
                row["cpu_1t"] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name} cpu: {row.get('cpu_1t')}", flush=True)
        results[name] = row
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
