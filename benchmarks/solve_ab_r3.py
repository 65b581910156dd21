"""End-to-end single-instance solve A/B: blocked vs native Schur factor.

Env NO_BLOCKED=1 runs the old path (HYPATIA_TPU_NO_BLOCKED). Reports
it/s over the fused on-device loop for the BASELINE configs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NO_BLOCKED"):
    os.environ["HYPATIA_TPU_NO_BLOCKED"] = "1"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import examples
from hypatia_tpu import Solver


def run(name, mod, params):
    t0 = time.time()
    wparams = dict(params)
    wparams["seed"] = params.get("seed", 1) + 1
    ws = Solver(verbose=False, fused=True, iter_limit=200,
                default_tol_relax=10)
    ws.load(mod.build(**wparams))
    ws.solve()
    compile_s = time.time() - t0
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(mod.build(**params))
    t0 = time.time()
    s.solve()
    wall = time.time() - t0
    it = s.get_num_iters()
    step = s.timers.get("step", wall)
    print(f"{name}: {s.get_status()} iters={it} step_s={step:.3f} "
          f"it/s={it/max(step,1e-9):.1f} ms/iter={step/max(it,1)*1e3:.1f} "
          f"(compile {compile_s:.0f}s) obj={s.get_primal_obj():.6f}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(),
          "NO_BLOCKED=", os.environ.get("NO_BLOCKED", ""), file=sys.stderr,
          flush=True)
    cfgs = os.environ.get(
        "CONFIGS", "linearopt,portfolio,doptimaldesign,polymin").split(",")
    table = {
        "linearopt": (examples.linearopt, dict(m=128, n=256)),
        "portfolio": (examples.portfolio, dict(num_stocks=100)),
        "doptimaldesign": (examples.doptimaldesign,
                           dict(q=10, p=30, n=60, n_max=6, use_logdet=True)),
        "polymin": (examples.polymin, dict(poly="univariate_quartic")),
        "relentr": (examples.relentrentanglement, dict(na=2, nb=2)),
    }
    for c in cfgs:
        mod, params = table[c]
        try:
            run(c, mod, params)
        except Exception as e:  # noqa: BLE001
            print(f"{c}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
