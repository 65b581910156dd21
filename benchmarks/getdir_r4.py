"""Round-4: find the true getdir bottleneck at MXU scale and measure the
n~1000 factorization regime (VERDICT r3 items 1-2).

Round-3 profile of linearopt_1k (m=1000, n=2000): getdir 36.7 ms/iter vs
upfact 5.0 ms — the direction solve dominates, not the factorization.
Hypothesis: the accurate-refinement path's cho_solve runs XLA's native
triangular solve with a VECTOR right-hand side at n=1000, a sequential
latency-bound kernel.  Candidate replacement: explicit-inverse matvec +
k inner correction matvecs through the stored Schur matrix (MXU-only).

Also measures chol+inv variants at n=768/1024/1536 (above the blocked cap
512 and the measured dd range) to extend the dispatch policy.

Run from repo root: python benchmarks/getdir_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__":
    # script-mode only (see manycone_r4.py round-5 incident note)
    _p = os.environ.get("JAX_PLATFORMS")
    if _p:  # sitecustomize pins axon; honor an explicit platform override
        jax.config.update("jax_platforms", _p.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import hypatia_tpu  # noqa: F401
from hypatia_tpu.ops import blocked, linalg


def spd(n, seed, cond=1e6):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, np.log10(cond), n)
    return jnp.asarray((Q * d) @ Q.T, dtype=jnp.float64)


def chain_mat(fn, K):
    """Fresh-input chained timing over matrix-to-matrix fn."""
    @jax.jit
    def run(A):
        def body(carry, _):
            out = fn(carry)
            nxt = carry + 1e-30 * (out @ out.swapaxes(-1, -2))
            return (nxt + nxt.swapaxes(-1, -2)) / 2, None
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)
    return run


def per_eval_ms_mat(fn, A, K1=2, K2=10):
    t = {}
    for K in (K1, K2):
        r = chain_mat(fn, K)
        float(r(A))  # compile + warm
        t0 = time.perf_counter()
        float(r(A + 1e-12 * jnp.eye(A.shape[-1], dtype=A.dtype)))
        t[K] = time.perf_counter() - t0
    return (t[K2] - t[K1]) / (K2 - K1) * 1e3


def chain_vec(fn, K):
    """Fresh-vector chained timing for solve-like ops with fixed factors."""
    def make(ctx):
        @jax.jit
        def run(v0):
            def body(v, _):
                out = fn(ctx, v)
                return out / jnp.maximum(jnp.max(jnp.abs(out)), 1e-300), None
            v, _ = jax.lax.scan(body, v0, None, length=K)
            return jnp.sum(v)
        return run
    return make


def per_eval_ms_vec(fn, ctx, n, K1=2, K2=20):
    rng = np.random.default_rng(0)
    t = {}
    for K in (K1, K2):
        r = chain_vec(fn, K)(ctx)
        float(r(jnp.asarray(rng.standard_normal(n))))
        t0 = time.perf_counter()
        float(r(jnp.asarray(rng.standard_normal(n) + 1.0)))
        t[K] = time.perf_counter() - t0
    return (t[K2] - t[K1]) / (K2 - K1) * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    n = int(os.environ.get("N", "1000"))
    A = spd(n, 1)
    L = jnp.linalg.cholesky(A)
    from hypatia_tpu.ops import pallas_dd

    Ld, Xd = blocked.blocked_chol_and_inv(
        A, base=256, base_case=pallas_dd.dd_chol_and_tri_inv)
    inv = Xd.swapaxes(-1, -2) @ Xd

    out = {}
    # --- solve-path candidates (vector RHS) ---
    out["native_trisolve2_vec_ms"] = per_eval_ms_vec(
        lambda ctx, v: jax.scipy.linalg.solve_triangular(
            ctx[0], jax.scipy.linalg.solve_triangular(ctx[0], v, lower=True),
            lower=True, trans=1), (L,), n)
    out["inv_matvec_ms"] = per_eval_ms_vec(
        lambda ctx, v: ctx[0] @ v, (inv,), n)

    def inv_corr(k):
        def f(ctx, v):
            invM, AM = ctx
            x = invM @ v
            for _ in range(k):
                x = x + invM @ (v - AM @ x)
            return x
        return f

    out["inv_matvec_corr1_ms"] = per_eval_ms_vec(inv_corr(1), (inv, A), n)
    out["inv_matvec_corr2_ms"] = per_eval_ms_vec(inv_corr(2), (inv, A), n)
    out["blocked_trisolve2_vec_ms"] = per_eval_ms_vec(
        lambda ctx, v: blocked.blocked_tri_solve(
            ctx[0], blocked.blocked_tri_solve(ctx[0], v[:, None]),
            trans=True)[:, 0], (L,), n)
    print("solve candidates:", {k: round(v, 3) for k, v in out.items()},
          flush=True)

    # --- accuracy of the candidates vs true solve (f64 host) ---
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    x_true = np.linalg.solve(np.asarray(A), b)
    for name, fn, ctx in [
        ("trisolve", lambda c, v: jax.scipy.linalg.solve_triangular(
            c[0], jax.scipy.linalg.solve_triangular(c[0], v, lower=True),
            lower=True, trans=1), (L,)),
        ("inv", lambda c, v: c[0] @ v, (inv,)),
        ("inv_corr1", inv_corr(1), (inv, A)),
        ("inv_corr2", inv_corr(2), (inv, A)),
    ]:
        x = np.asarray(jax.jit(fn)(ctx, jnp.asarray(b)))
        rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
        print(f"accuracy {name}: rel_err={rel:.2e}", flush=True)

    # --- factorization regime n in {768, 1024, 1536} ---
    for nf in [int(x) for x in os.environ.get("SIZES",
                                              "768,1024,1536").split(",")]:
        Af = spd(nf, nf)
        row = {}

        def native(M):
            Lf = jnp.linalg.cholesky(M)
            eye = jnp.eye(nf, dtype=M.dtype)
            Li = jax.scipy.linalg.solve_triangular(Lf, eye, lower=True)
            return Li.T @ Li

        row["native_chol_inv"] = per_eval_ms_mat(native, Af)

        def dd_panels(base):
            def f(M):
                Lf, Xf = blocked.blocked_chol_and_inv(
                    M, base=base, base_case=pallas_dd.dd_chol_and_tri_inv)
                return Xf.swapaxes(-1, -2) @ Xf
            return f

        row["dd_base256"] = per_eval_ms_mat(dd_panels(256), Af)
        row["dd_base512"] = per_eval_ms_mat(dd_panels(512), Af)
        try:
            row["dd_full"] = per_eval_ms_mat(
                lambda M: pallas_dd.dd_chol_and_tri_inv(M)[1], Af)
        except Exception as e:  # noqa: BLE001
            row["dd_full"] = f"ERR {type(e).__name__}"
        print(f"fact n={nf}:",
              {k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in row.items()}, flush=True)


if __name__ == "__main__":
    main()
