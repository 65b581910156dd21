"""Round-4: many-small-cone Schur assembly measurement (VERDICT r3 item 7).

The reference covers many-cone sparse models via SymIndefSparse + the
Hessian-sparsity query API (`symindef.jl:58-197`).  The TPU answer is
grouped (BatchedCone) oracles + the single-matmul folded Schur assembly:
this script measures a 1000-cone LP/SOC mix (500 Nonnegative(2) + 500
EpiNormEucl(3), q=2500) and A/Bs the folded one-matmul assembly against
the round-3 two-matmul form, then reports end-to-end iteration rate.

Run from repo root: python benchmarks/manycone_r4.py  (any backend).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__":
    # Only reconfigure the backend when run AS A SCRIPT: the session env
    # pins JAX_PLATFORMS=axon, so doing this at import time silently moved
    # an importing caller's intended-CPU run onto the single-client TPU
    # (round-5 incident: a timed-out "CPU" diagnosis killed mid-compile
    # wedged the device pool for ~15 minutes).
    _p = os.environ.get("JAX_PLATFORMS")
    if _p:  # sitecustomize pins axon; honor an explicit platform override
        jax.config.update("jax_platforms", _p.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from hypatia_tpu import Model, Solver, cones


def build_manycone(n_lp=500, n_soc=500, nx=400, seed=3):
    """LP/SOC mix: min c'x s.t. rows of G x + h in 500 Nonnegative(2) +
    500 EpiNormEucl(3) cones, sum x = 1. Built around a strictly feasible
    point."""
    rng = np.random.default_rng(seed)
    x0 = np.ones(nx) / nx
    cone_list, G_rows, h_rows = [], [], []
    for _ in range(n_lp):
        Gk = -((rng.random((2, nx)) < 0.05) * rng.random((2, nx)))
        hk = -(Gk @ x0) + 0.1 + 0.1 * rng.random(2)
        cone_list.append(cones.Nonnegative(2))
        G_rows.append(Gk)
        h_rows.append(hk)
    for _ in range(n_soc):
        Fk = (rng.random((2, nx)) < 0.05) * rng.standard_normal((2, nx))
        gk = Fk @ x0
        Gk = np.zeros((3, nx))
        Gk[1:, :] = -Fk
        hk = np.concatenate([[0.2 + 0.1 * rng.random()], gk * 0 + 0.0])
        hk[1:] = gk - Fk @ x0  # = 0 at x0; strict interior via margin t
        cone_list.append(cones.EpiNormEucl(3))
        G_rows.append(Gk)
        h_rows.append(hk)
    A = np.ones((1, nx))
    b = np.array([1.0])
    c = 0.1 + rng.random(nx)
    return Model(c, A, b, np.vstack(G_rows), np.concatenate(h_rows),
                 cone_list)


def main():
    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    model = build_manycone()
    print(f"model: n={model.n} p={model.p} q={model.q} "
          f"cones={len(model.cones)}", file=sys.stderr, flush=True)

    # end-to-end solve (grouped cones by default)
    t0 = time.time()
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(model)
    s.solve()
    compile_wall = time.time() - t0
    # warm re-solve on fresh data
    model2 = build_manycone(seed=4)
    s2 = Solver(verbose=False, fused=True, iter_limit=200,
                default_tol_relax=10)
    s2.load(model2)
    t0 = time.time()
    s2.solve()
    wall = time.time() - t0
    step_s = s2.timers.get("step", wall)
    out = {
        "status": s2.get_status(), "iters": s2.get_num_iters(),
        "obj": s2.get_primal_obj(),
        "iters_per_s": round(s2.get_num_iters() / max(step_s, 1e-9), 2),
        "first_solve_wall_s": round(compile_wall, 1),
    }
    print(json.dumps(out), flush=True)

    # A/B: folded one-matmul assembly vs round-3 two-matmul form, at this
    # model's real Schur shape (fresh-input chained timing)
    from hypatia_tpu.solvers.structures import StepContext, compute_iter_aux
    from hypatia_tpu.cones.batched import group_cones
    from hypatia_tpu.solvers.structures import (block_hess_prod,
                                                block_sqrt_hess_prod)

    g_cones, g_idxs = group_cones(tuple(model.cones),
                                  tuple(model.cone_idxs))
    ctx = s.ctx
    data = s.data
    iter_aux = jax.jit(
        lambda pt: compute_iter_aux(ctx, pt))(s.final_point)
    GQ2 = data["GQ2"]

    def hess_mats(GQ2v):
        sqrt_ks = [k for k, c in enumerate(ctx.cones)
                   if ctx.schur_syrk and c.has_sqrt_oracles]
        gemm_ks = [k for k in range(len(ctx.cones)) if k not in sqrt_ks]
        U = jnp.zeros_like(GQ2v)
        for k in sqrt_ks:
            st, d = ctx.cone_idxs[k]
            U = U.at[st:st + d].set(
                block_sqrt_hess_prod(ctx, iter_aux, k, GQ2v[st:st + d]))
        H = jnp.zeros_like(GQ2v)
        for k in gemm_ks:
            st, d = ctx.cone_idxs[k]
            H = H.at[st:st + d].set(
                block_hess_prod(ctx, iter_aux, k, GQ2v[st:st + d]))
        gmask = np.zeros((ctx.q, 1))
        for k in gemm_ks:
            st, d = ctx.cone_idxs[k]
            gmask[st:st + d] = 1.0
        return U, H, jnp.asarray(gmask, dtype=GQ2v.dtype)

    def folded(GQ2v):
        U, H, gm = hess_mats(GQ2v)
        L = U + gm * GQ2v
        R = U + H
        S = L.T @ R
        return (S + S.T) / 2

    def two_matmul(GQ2v):
        U, H, gm = hess_mats(GQ2v)
        S = U.T @ U
        gl = GQ2v.T @ H
        return S + (gl + gl.T) / 2

    def per_eval_ms(fn, K1=2, K2=8):
        def chain(K):
            @jax.jit
            def run(M):
                def body(carry, _):
                    out = fn(carry)
                    return carry + 1e-30 * jnp.sum(out), None
                M2, _ = jax.lax.scan(body, M, None, length=K)
                return jnp.sum(M2)
            return run
        t = {}
        for K in (K1, K2):
            r = chain(K)
            float(r(GQ2))
            t0 = time.perf_counter()
            float(r(GQ2 + 1e-14))
            t[K] = time.perf_counter() - t0
        return (t[K2] - t[K1]) / (K2 - K1) * 1e3

    ab = {"folded_ms": round(per_eval_ms(folded), 3),
          "two_matmul_ms": round(per_eval_ms(two_matmul), 3)}
    # exactness: the fold must equal the two-matmul form to roundoff
    d = float(jnp.max(jnp.abs(folded(GQ2) - two_matmul(GQ2))))
    ab["max_abs_diff"] = d
    print("assembly A/B:", json.dumps(ab), flush=True)


if __name__ == "__main__":
    main()
