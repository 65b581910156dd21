"""A/B: force the blocked (matmul-only) factorizations in the UNBATCHED
single-instance solve (TODO 'Blocked on TPU access' item 1).

The default scopes the blocked kernels to vmapped contexts (line search,
batched body); the single-instance Schur Cholesky keeps XLA's native
sequential kernel.  This script measures whether the blocked kernel also
wins unbatched: run with HYPATIA_TPU_FORCE_BLOCKED=1 (and compare against
the base sweep's numbers in round2_tpu_results.json).

Writes benchmarks/round2_tpu_results.json keys suffixed by the mode.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.round2_tpu_measure import record, run_single  # noqa: E402


def main():
    import examples

    mode = ("force" if os.environ.get("HYPATIA_TPU_FORCE_BLOCKED")
            else "noblk" if os.environ.get("HYPATIA_TPU_NO_BLOCKED")
            else "default")
    profile = bool(os.environ.get("MEASURE_PROFILE"))
    record(f"linearopt_{mode}", run_single(
        examples.linearopt, dict(m=128, n=256, seed=1), profile=profile))
    record(f"doptimaldesign_{mode}", run_single(
        examples.doptimaldesign,
        dict(q=10, p=30, n=60, n_max=6, use_logdet=True), profile=profile))


if __name__ == "__main__":
    main()
