"""MXU-scale benchmark configs (VERDICT round-3 item 3): problems with
n-p / cone dims in the 1k-5k range where the TPU should win structurally.

Runs each config in the current process's backend; the single-thread CPU
proxy runs in a subprocess (same protocol as bench.py's baseline).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = {
    "linearopt_1k": ("linearopt", dict(m=1000, n=2000)),
    "doptimaldesign_q100": ("doptimaldesign",
                            dict(q=100, p=300, n=600, n_max=60,
                                 use_logdet=True)),
    "nearestpsd_60": ("nearestpsd", dict(side=60)),
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
        wp = dict(params)
        wp["seed"] = 2
        ws = Solver(verbose=False, fused=True, iter_limit=200,
                    default_tol_relax=10)
        ws.load(mod.build(**wp))
        ws.solve()
        compile_s = time.time() - t0
        p = dict(params)
        p["seed"] = 1
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=10)
        s.load(mod.build(**p))
        t0 = time.time()
        s.solve()
        wall = time.time() - t0
        it, step = s.get_num_iters(), s.timers.get("step", wall)
        rec = {"status": s.get_status(), "iters": it,
               "step_s": round(step, 3),
               "iters_per_s": round(it / max(step, 1e-9), 2),
               "compile_s": round(compile_s, 1)}
        if do_cpu:
            try:
                rec["cpu_1t"] = cpu_baseline(fam, params)
                rec["vs_cpu_1t"] = round(
                    rec["iters_per_s"] / rec["cpu_1t"]["iters_per_s"], 2)
            except Exception as e:  # noqa: BLE001
                rec["cpu_1t"] = {"error": str(e)[-200:]}
        results[name] = rec
        print(f"{name}: {rec}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
