"""Small-matrix factorization latency on TPU (fresh-input chained timing).

doptimaldesign/polymin iterations are cone-oracle-dominated; their
point_aux chains factor small (8-64) matrices through XLA's native
kernels. Measures native chol / eigh / trisolve vs the blocked kernels
and Jacobi eigh at those sizes to decide an auto-blocked policy for the
unbatched cone-oracle path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import hypatia_tpu  # noqa: F401
from hypatia_tpu.ops import blocked, spectral


def spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n), dtype=jnp.float64)


def chain(fn, K, sym=True):
    @jax.jit
    def run(A):
        def body(carry, _):
            out = fn(carry)
            out0 = out[1] if isinstance(out, tuple) else out
            if out0.ndim == 1:
                nxt = carry + 1e-30 * jnp.outer(out0, out0)
            else:
                nxt = carry + 1e-30 * (out0 @ jnp.swapaxes(out0, -1, -2))
            return (nxt + jnp.swapaxes(nxt, -1, -2)) / 2, None
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)
    return run


def per_eval_ms(fn, n, K1=2, K2=22):
    t = {}
    for K in (K1, K2):
        r = chain(fn, K)
        float(r(spd(n, 0)))
        t0 = time.perf_counter()
        float(r(spd(n, K)))
        t[K] = time.perf_counter() - t0
    return (t[K2] - t[K1]) / (K2 - K1) * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    sizes = [int(x) for x in os.environ.get("SIZES", "8,16,32,64").split(",")]
    for n in sizes:
        out = {}
        out["native_chol"] = per_eval_ms(jnp.linalg.cholesky, n)
        out["blocked_chol"] = per_eval_ms(blocked.blocked_cholesky, n)

        def nat_cholinv(A):
            L = jnp.linalg.cholesky(A)
            Li = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(n, dtype=A.dtype), lower=True)
            return Li.T @ Li
        out["native_chol+inv"] = per_eval_ms(nat_cholinv, n)

        def blk_cholinv(A):
            L, Li = blocked.blocked_chol_and_inv(A)
            return Li.T @ Li
        out["blocked_chol+inv"] = per_eval_ms(blk_cholinv, n)
        out["native_eigh"] = per_eval_ms(jnp.linalg.eigh, n)
        if n <= 16:
            out["jacobi_eigh"] = per_eval_ms(spectral.jacobi_eigh, n)
        print(f"n={n}:", {k: round(v, 3) for k, v in out.items()},
              flush=True)


if __name__ == "__main__":
    main()
