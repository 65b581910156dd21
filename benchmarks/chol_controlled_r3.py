"""Controlled chol timing: fresh inputs per timed call (defeats any
result memoization in the remote-execution layer), random-SPD vs the real
solver Schur matrix (tests value-dependent cost), K-chain differencing.
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

import examples
from hypatia_tpu import Solver


def chain_fn(K):
    @jax.jit
    def run(A):
        def body(carry, _):
            L = jnp.linalg.cholesky(carry)
            # re-form a new SPD input that depends on L
            nxt = carry + 1e-30 * (L @ L.T)
            return (nxt + nxt.T) / 2, None
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)

    return run


def timed(run, A):
    r = run(A)
    r.block_until_ready()
    float(r)  # force full host fetch
    return None


def measure(A_list, K):
    run = chain_fn(K)
    timed(run, A_list[0])  # compile
    t0 = time.perf_counter()
    timed(run, A_list[1])  # FRESH input
    return time.perf_counter() - t0


def per_eval_ms(A_list, K1=2, K2=18):
    t1 = measure(A_list, K1)
    t2 = measure((A_list[0], A_list[2]), K2)
    return (t2 - t1) / (K2 - K1) * 1e3, t1, t2


def spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n), dtype=jnp.float64)


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    n = 128

    # 1) random SPD, fresh inputs
    ms, t1, t2 = per_eval_ms([spd(n, s) for s in range(3)])
    print(f"random SPD {n}: {ms:.3f} ms/chol (t2={t1*1e3:.1f} "
          f"t18={t2*1e3:.1f} ms)", flush=True)

    # 2) the real solver Schur matrix at the final iterate
    model = examples.linearopt.build(m=128, n=256)
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(model)
    s.solve()
    from hypatia_tpu.solvers import syssolvers
    from hypatia_tpu.solvers.structures import compute_iter_aux
    ctx, data = s.ctx, s.data
    ia = jax.jit(lambda pt: compute_iter_aux(ctx, pt))(s.final_point)
    GQ2 = data["GQ2"]
    from hypatia_tpu.solvers.structures import block_sqrt_hess_prod

    @jax.jit
    def schur(data, ia):
        U = block_sqrt_hess_prod(ctx, ia, 0, data["GQ2"])
        return U.T @ U

    lhs = schur(data, ia)
    lhs_np = np.asarray(lhs)
    print(f"real Schur: cond={np.linalg.cond(lhs_np):.2e} "
          f"|max|={np.abs(lhs_np).max():.2e}", flush=True)
    # same matrix, three tiny value variants (fresh buffers + fresh values)
    reals = [jnp.asarray(lhs_np * (1.0 + 1e-14 * k)) for k in range(3)]
    ms, t1, t2 = per_eval_ms(reals)
    print(f"real Schur {lhs_np.shape[0]}: {ms:.3f} ms/chol "
          f"(t2={t1*1e3:.1f} t18={t2*1e3:.1f} ms)", flush=True)

    # 3) real Schur, Jacobi-equilibrated (diag scaled to 1)
    d = 1.0 / np.sqrt(np.diag(lhs_np))
    eq = lhs_np * d[:, None] * d[None, :]
    eqs = [jnp.asarray(eq * (1.0 + 1e-14 * k)) for k in range(3)]
    ms, t1, t2 = per_eval_ms(eqs)
    print(f"equilibrated Schur: {ms:.3f} ms/chol cond={np.linalg.cond(eq):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
