"""Round-3: blocked-vs-native factorization A/B at the real Schur sizes.

Uses the scan-differencing methodology from solvers/profile.py (the
micro_chol_r3 single-call timing was an artifact: repeated execution with
identical inputs short-circuits on this stack). Sizes: 128 = linearopt
Schur, then MXU-relevant 256/512/1024.
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

import hypatia_tpu  # noqa: F401  (x64)
from hypatia_tpu.ops import blocked
from hypatia_tpu.solvers.profile import _phase_ms


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n), dtype=jnp.float64)


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    sizes = [int(x) for x in
             (os.environ.get("SIZES", "128,256,512").split(","))]
    bases = [int(x) for x in (os.environ.get("BASES", "32,64").split(","))]
    for n in sizes:
        A = spd(n)
        out = {}
        t0 = time.time()
        out["native_chol"] = _phase_ms(jnp.linalg.cholesky, (A,))
        L = jnp.linalg.cholesky(A)
        eye = jnp.eye(n, dtype=A.dtype)
        out["native_trisolve_I"] = _phase_ms(
            lambda L: jax.scipy.linalg.solve_triangular(L, eye, lower=True),
            (L,))
        for base in bases:
            tc = time.time()
            out[f"blocked{base}_chol"] = _phase_ms(
                lambda A: blocked.blocked_cholesky(A, base=base), (A,))
            out[f"blocked{base}_triinv"] = _phase_ms(
                lambda L: blocked.blocked_tri_inverse(L, base=base), (L,))
            out[f"blocked{base}_compile_s"] = round(time.time() - tc, 1)
        print(f"n={n}:",
              {k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in out.items()},
              f"wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
