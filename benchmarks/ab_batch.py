"""A/B: batched-instance throughput variants (TODO item 2).

Modes (set by env):
  - default:                chunked host loop (chunk=16)
  - HYPATIA_TPU_BATCH_FUSED=1:  retry the fully fused batched while_loop
    (round 1: crashed XLA memory-space assignment with the native batched
    cholesky; the blocked matmul-only factorizations may fix it)
  - HYPATIA_TPU_BATCH_CHUNK=N:  override the scan chunk length

Records batch32_<mode> into benchmarks/round2_tpu_results.json.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.round2_tpu_measure import record  # noqa: E402


def main():
    import examples
    from hypatia_tpu.parallel import solve_batch

    mode = ("fused" if os.environ.get("HYPATIA_TPU_BATCH_FUSED")
            else f"chunk{os.environ.get('HYPATIA_TPU_BATCH_CHUNK', '16')}")
    nb, m, n = 32, 64, 128
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
    record(f"batch32_{mode}", dict(
        batch=nb, optimal=sum(r["status"] == "Optimal" for r in res),
        total_iters=tot, solve_s=round(wall, 3),
        agg_iters_per_s=round(tot / wall, 1),
        first_call_s=round(compile_s, 1)))


if __name__ == "__main__":
    main()
