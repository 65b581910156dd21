"""Round-3 factorization A/B on real TPU.

The round-2 profile says upfact (chol(n-p=256) + explicit tri inverse) is
8.8 ms of the 14.5 ms linearopt iteration. Candidates:

  native  : jnp.linalg.cholesky + triangular_solve vs I
  blocked : ops/blocked.py recursive matmul/VPU kernels, base in {16,32,64}

Timing method (BASELINE.md round-1 analysis): chain K dependent evaluations
inside ONE jitted program via lax.scan so per-call dispatch (~30 ms) is
amortized; report per-evaluation device time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from hypatia_tpu.ops import blocked


def chain(fn, A, K=20):
    """Run fn K times with a data dependency, inside one program."""
    def body(carry, _):
        out = fn(carry)
        # re-symmetrize result into a new SPD input to keep dependency
        nxt = carry + 1e-12 * (out[0] if isinstance(out, tuple) else out)
        nxt = (nxt + nxt.T) / 2
        return nxt, None
    f = jax.jit(lambda A0: jax.lax.scan(body, A0, None, length=K)[0])
    r = f(A)
    r.block_until_ready()
    t0 = time.time()
    r = f(A)
    r.block_until_ready()
    return (time.time() - t0) / K * 1e3  # ms per eval


def native_chol_inv(A):
    L = jnp.linalg.cholesky(A)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Li.T @ Li


def native_chol_only(A):
    return jnp.linalg.cholesky(A)


def make_blocked(base):
    def f(A):
        L, Li = blocked.blocked_chol_and_inv(A, base=base)
        return Li.T @ Li
    return f


def spd(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    return jnp.asarray(A, dtype=dtype)


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    for dtype in (jnp.float64,):
        for n in (256, 512, 1024):
            A = spd(n, dtype)
            K = 20 if n <= 512 else 8
            rows = {}
            rows["native_chol"] = chain(native_chol_only, A, K)
            rows["native_chol+inv"] = chain(native_chol_inv, A, K)
            for base in (16, 32, 64):
                try:
                    t0 = time.time()
                    rows[f"blocked{base}"] = chain(make_blocked(base), A, K)
                    rows[f"blocked{base}_compile_s"] = round(
                        time.time() - t0, 1)
                except Exception as e:  # noqa: BLE001
                    rows[f"blocked{base}"] = f"ERR {type(e).__name__}"
            print(f"n={n} {np.dtype(dtype).name}:",
                  {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in rows.items()}, flush=True)


if __name__ == "__main__":
    main()
