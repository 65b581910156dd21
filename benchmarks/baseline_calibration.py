"""Baseline-proxy calibration (VERDICT round-2 item 5).

`bench.py`'s vs_baseline denominator is THIS solver pinned to one CPU
thread — a proxy for "single-thread Julia Hypatia" (Julia is not
installed here; BASELINE.md documents the substitution).  Julia's hot
kernels are LAPACK dpotrf + BLAS dsyrk/dgemm, the same libraries NumPy
calls; so the proxy is fair exactly to the extent that single-thread
jax-CPU matches single-thread NumPy/LAPACK on those primitives at the
bench sizes.  This script measures that ratio.

Run: OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1 \
     python benchmarks/baseline_calibration.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(v, "1")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_cpu_multi_thread_eigen=false"
                           + " intra_op_parallelism_threads=1").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def best_of(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("numpy BLAS:", np.__config__.show(mode="dicts")
          ["Build Dependencies"]["blas"]["name"], file=sys.stderr)
    rows = []
    for n in (128, 256, 512, 1024):
        rng = np.random.default_rng(0)
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        B = rng.standard_normal((n, n))

        np_chol = best_of(lambda: np.linalg.cholesky(A))
        np_gemm = best_of(lambda: B @ B.T)

        Aj = jnp.asarray(A)
        Bj = jnp.asarray(B)
        jchol = jax.jit(jnp.linalg.cholesky)
        jgemm = jax.jit(lambda X: X @ X.T)
        jchol(Aj).block_until_ready()
        jgemm(Bj).block_until_ready()
        jx_chol = best_of(lambda: jchol(Aj).block_until_ready())
        jx_gemm = best_of(lambda: jgemm(Bj).block_until_ready())

        rows.append((n, np_chol * 1e3, jx_chol * 1e3,
                     jx_chol / np_chol, np_gemm * 1e3, jx_gemm * 1e3,
                     jx_gemm / np_gemm))

    print(f"{'n':>6} {'np_potrf_ms':>12} {'jax_chol_ms':>12} {'ratio':>7} "
          f"{'np_gemm_ms':>11} {'jax_gemm_ms':>12} {'ratio':>7}")
    for r in rows:
        print(f"{r[0]:6d} {r[1]:12.3f} {r[2]:12.3f} {r[3]:7.2f} "
              f"{r[4]:11.3f} {r[5]:12.3f} {r[6]:7.2f}")
    print("\nratio > 1: jax-CPU slower than LAPACK/BLAS (the proxy "
          "UNDERSTATES the reference, making vs_baseline conservative is "
          "ratio < 1, optimistic if > 1)")


if __name__ == "__main__":
    main()
