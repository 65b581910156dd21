"""Round-3 batch32 A/B on TPU: fused batched while_loop (blocked kernels)
vs chunked host loop, vs single-instance throughput.

Round-2 record: batch32 of 128-dim LPs = 13.8-18.4 aggregate it/s vs ~71
it/s for ONE instance (a 4x regression). The fused batched while_loop
previously crashed XLA's memory-space-assignment with the native batched
cholesky; the blocked (matmul-only) kernels now used in the vmapped body
are the retry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import examples
from hypatia_tpu.parallel import solve_batch


def run(mode, nb=32, m=64, n=128):
    os.environ["HYPATIA_TPU_BATCH_FUSED"] = ("1" if mode == "fused" else "0")
    models = [examples.linearopt.build(m=m, n=n, seed=s) for s in range(nb)]
    warm = [examples.linearopt.build(m=m, n=n, seed=1000 + s)
            for s in range(nb)]
    t0 = time.time()
    solve_batch(warm, solver_options=dict(default_tol_relax=10))
    compile_s = time.time() - t0
    t0 = time.time()
    res = solve_batch(models, solver_options=dict(default_tol_relax=10))
    wall = time.time() - t0
    tot = sum(r["num_iters"] for r in res)
    nopt = sum(r["status"] == "Optimal" for r in res)
    from hypatia_tpu.parallel import batch as pbatch
    tm = dict(pbatch.LAST_TIMERS)
    solve_s = tm.get("solve_s", wall)
    print(f"{mode}: optimal={nopt}/{nb} iters={tot} wall={wall:.2f}s "
          f"agg={tot/wall:.1f} it/s device={tot/solve_s:.1f} it/s "
          f"timers={ {k: round(v, 2) for k, v in tm.items()} } "
          f"(compile {compile_s:.0f}s)", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    modes = os.environ.get("MODES", "fused,chunk").split(",")
    for mode in modes:
        try:
            run(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
