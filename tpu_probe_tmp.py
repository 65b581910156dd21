import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, json, sys
import numpy as np
import examples
from hypatia_tpu import Solver

def run(mod, params, relax=10):
    model = mod.build(**params)
    s = Solver(verbose=False, fused=True, iter_limit=200, default_tol_relax=relax)
    s.load(model); s.solve()  # compile+solve
    model2 = mod.build(**{**params, "seed": params.get("seed", 0)+1} if "seed" in params else params)
    s2 = Solver(verbose=False, fused=True, iter_limit=200, default_tol_relax=relax)
    s2.load(model2); t0=time.time(); s2.solve(); wall=time.time()-t0
    st = s2.timers.get("step", wall)
    return dict(status=s2.get_status(), iters=s2.get_num_iters(),
                iters_per_s=round(s2.get_num_iters()/max(st,1e-9),2))

print("linearopt:", run(examples.linearopt, dict(m=128, n=256, seed=1)), flush=True)
print("doptimaldesign:", run(examples.doptimaldesign, dict(q=10, p=30, n=60, n_max=6, use_logdet=True)), flush=True)

from hypatia_tpu.parallel import solve_batch
def run_batch(nb=32, m=64, n=128):
    models = [examples.linearopt.build(m=m, n=n, seed=s) for s in range(nb)]
    warm = [examples.linearopt.build(m=m, n=n, seed=1000+s) for s in range(nb)]
    solve_batch(warm, solver_options=dict(default_tol_relax=10))
    t0 = time.time()
    res = solve_batch(models, solver_options=dict(default_tol_relax=10))
    wall = time.time()-t0
    tot = sum(r["num_iters"] for r in res)
    return dict(batch=nb, optimal=sum(r["status"]=="Optimal" for r in res),
                total_iters=tot, solve_s=round(wall,3),
                agg_iters_per_s=round(tot/wall,1))
print("batch32:", run_batch(), flush=True)
