"""Where do relentr's 270 bench seconds go? (round 5 diagnosis)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import examples
from hypatia_tpu import Solver

def stamp(msg, t0=[time.time()]):
    now = time.time()
    print(f"[{now-t0[0]:8.1f}s] {msg}", flush=True)
    t0[0] = now

stamp("imports done")
m1 = examples.relentrentanglement.build(na=2, nb=2, seed=2)
stamp("build warm model")
s = Solver(verbose=False, fused=True, iter_limit=200, default_tol_relax=10)
s.load(m1)
stamp("load warm model (preprocess)")
s.solve()
stamp(f"warm solve ({s.get_status()}, step_s={s.timers.get('step'):.2f})")
m2 = examples.relentrentanglement.build(na=2, nb=2, seed=1)
stamp("build real model")
s2 = Solver(verbose=False, fused=True, iter_limit=200, default_tol_relax=10)
s2.load(m2)
stamp("load real model")
s2.solve()
stamp(f"real solve ({s2.get_status()}, step_s={s2.timers.get('step'):.2f})")
