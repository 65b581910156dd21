"""Measure the 2xf32 Pallas dd factor+inverse kernel on real TPU vs the
blocked-XLA and native paths (fresh-input chained timing)."""

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
from hypatia_tpu.ops.pallas_dd import dd_chol_and_tri_inv


def spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n), dtype=jnp.float64)


def chain(fn, K):
    @jax.jit
    def run(A):
        def body(carry, _):
            out = fn(carry)
            out0 = out[1] if isinstance(out, tuple) else out
            nxt = carry + 1e-30 * (out0 @ out0.T)
            return (nxt + nxt.T) / 2, None
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)
    return run


def per_eval_ms(fn, n, K1=2, K2=18):
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
    # correctness on-device first
    A = spd(128, 7)
    L, X = dd_chol_and_tri_inv(A)
    Lr = np.linalg.cholesky(np.asarray(A))
    errL = float(np.max(np.abs(np.asarray(L) - Lr)) / np.max(np.abs(Lr)))
    errI = float(np.max(np.abs(np.asarray(X) @ Lr - np.eye(128))))
    print(f"correctness: |L-Lref|={errL:.2e} |X L - I|={errI:.2e}",
          flush=True)

    for n in [int(x) for x in os.environ.get("SIZES", "128,256").split(",")]:
        out = {}
        t0 = time.time()
        out["dd_pallas"] = per_eval_ms(
            lambda A: dd_chol_and_tri_inv(A), n)
        out["dd_compile_s"] = round(time.time() - t0)

        def blk(A):
            L, Li = blocked.blocked_chol_and_inv(A)
            return Li.T @ Li
        out["blocked16"] = per_eval_ms(blk, n)
        print(f"n={n}:", {k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
