"""TPU microbenchmarks for the batched-solve cost model.

Times the primitive kernels the batched IPM leans on, isolating whether
batched (vmapped) cholesky / triangular-solve serialize over the batch on
TPU — the round-1 hypothesis for why batch-32 throughput regressed.
Scan-of-reps method (one program; data-dependent chaining) as in
benchmarks/profile_step.py.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    @jax.jit
    def run(*a):
        def body(carry, _):
            acc, a0 = carry, a
            out = fn(*a)
            bump = 1.0 + 1e-300 * jnp.sum(jnp.real(out))
            return acc * bump + jnp.sum(jnp.real(out)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
        return acc

    run(*args).block_until_ready()
    t0 = time.time()
    run(*args).block_until_ready()
    return (time.time() - t0) / reps


def main():
    import os
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    rng = np.random.default_rng(0)
    n = 128
    B = 32
    A1 = rng.standard_normal((n, n))
    spd1 = jnp.asarray(A1 @ A1.T + n * np.eye(n))
    Ab = rng.standard_normal((B, n, n))
    spdb = jnp.asarray(np.einsum("bij,bkj->bik", Ab, Ab)
                       + n * np.eye(n)[None])
    V1 = jnp.asarray(rng.standard_normal((n, n)))
    Vb = jnp.asarray(rng.standard_normal((B, n, n)))

    out = {}
    out["chol_1"] = timeit(jnp.linalg.cholesky, spd1)
    out["chol_b32"] = timeit(jnp.linalg.cholesky, spdb)
    out["chol_vmap32"] = timeit(jax.vmap(jnp.linalg.cholesky), spdb)

    import jax.scipy.linalg as jsl
    tri1 = jnp.linalg.cholesky(spd1)
    trib = jnp.linalg.cholesky(spdb)
    st = lambda L, B_: jsl.solve_triangular(L, B_, lower=True)
    out["trisolve_1"] = timeit(st, tri1, V1)
    out["trisolve_b32"] = timeit(st, trib, Vb)

    out["matmul_1"] = timeit(lambda a, b: a @ b, spd1, V1)
    out["matmul_b32"] = timeit(lambda a, b: a @ b, spdb, Vb)

    out["qr_1"] = timeit(lambda a: jnp.linalg.qr(a)[1], spd1)
    out["qr_b32"] = timeit(lambda a: jnp.linalg.qr(a)[1], spdb)

    # 18-candidate line-search shape (matrix cones): vmapped chol of small
    d = 30
    C18 = rng.standard_normal((18, d, d))
    spd18 = jnp.asarray(np.einsum("bij,bkj->bik", C18, C18)
                        + d * np.eye(d)[None])
    out[f"chol_18x{d}"] = timeit(jnp.linalg.cholesky, spd18)
    C1s = jnp.asarray(spd18[0])
    out[f"chol_1x{d}"] = timeit(jnp.linalg.cholesky, C1s)

    for k, v in out.items():
        print(f"{k:16s} {1e3 * v:8.3f} ms", file=sys.stderr)
    print(json.dumps({k: round(1e3 * v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
