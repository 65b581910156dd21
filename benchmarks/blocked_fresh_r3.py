"""Blocked-vs-native factorization, FRESH-INPUT timing (the reliable
methodology: repeated execution with identical inputs short-circuits in
this stack — see chol_controlled_r3 findings)."""

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
from hypatia_tpu.ops import blocked


def spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n), dtype=jnp.float64)


def chain(fn, K):
    @jax.jit
    def run(A):
        def body(carry, _):
            out = fn(carry)
            nxt = carry + 1e-30 * (out @ out.T)
            return (nxt + nxt.T) / 2, None
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)
    return run


def per_eval_ms(fn, n, K1=2, K2=18):
    r1, r2 = chain(fn, K1), chain(fn, K2)
    t = {}
    for K, r in ((K1, r1), (K2, r2)):
        float(r(spd(n, 0)))  # compile + warm
        t0 = time.perf_counter()
        float(r(spd(n, K)))  # fresh input
        t[K] = time.perf_counter() - t0
    return (t[K2] - t[K1]) / (K2 - K1) * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    sizes = [int(x) for x in os.environ.get("SIZES", "128,256").split(",")]
    bases = [int(x) for x in os.environ.get("BASES", "32,64").split(",")]
    for n in sizes:
        out = {}
        out["native_chol"] = per_eval_ms(jnp.linalg.cholesky, n)

        def native_cholinv(A):
            L = jnp.linalg.cholesky(A)
            Li = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(n, dtype=A.dtype), lower=True)
            return Li.T @ Li
        out["native_chol+inv"] = per_eval_ms(native_cholinv, n)
        for base in bases:
            t0 = time.time()

            def blk(A, base=base):
                L, Li = blocked.blocked_chol_and_inv(A, base=base)
                return Li.T @ Li
            try:
                out[f"blocked{base}_chol+inv"] = per_eval_ms(blk, n)
                out[f"blocked{base}_compile_s"] = round(time.time() - t0)
            except Exception as e:  # noqa: BLE001
                out[f"blocked{base}_chol+inv"] = f"ERR {type(e).__name__}"
        print(f"n={n}:", {k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
