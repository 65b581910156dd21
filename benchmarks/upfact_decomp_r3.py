"""Round-3: decompose the linearopt upfact phase (8.8 ms of 14.5 ms/iter).

update_lhs = Schur assembly (matmuls) + cholesky_shifted + chol_inverse +
constant-RHS subsystem3 solve. Times each piece with the proven scan-of-N
differencing methodology from solvers/profile.py, plus raw-kernel probes
(native chol / trisolve-vs-I / matmul) at the same size to separate
algorithm cost from kernel cost.
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
from hypatia_tpu.ops import linalg
from hypatia_tpu.solvers import syssolvers
from hypatia_tpu.solvers.profile import _phase_ms, _time_scan
from hypatia_tpu.solvers.structures import compute_iter_aux


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    model = examples.linearopt.build(m=128, n=256)
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(model)
    t0 = time.time()
    s.solve()
    wall = time.time() - t0
    iters = s.get_num_iters()
    step_s = s.timers.get("step", wall)
    print(f"solve: {s.get_status()} iters={iters} step_s={step_s:.3f} "
          f"ms/iter={step_s/max(iters,1)*1e3:.2f}", flush=True)

    ctx, data = s.ctx, s.data
    pt = s.final_point
    ia = jax.jit(lambda pt: compute_iter_aux(ctx, pt))(pt)
    nmp = data["GQ2"].shape[1]
    print(f"n={ctx.n} p={ctx.p} q={ctx.q} n-p(Schur)={nmp}", flush=True)

    out = {}
    # full update_lhs
    out["upfact_full"] = _phase_ms(
        lambda d, i: syssolvers.update_lhs(ctx, d, i), (data, ia))

    # Schur assembly only (stop before factorization)
    def assemble(d, i):
        GQ2 = d["GQ2"]
        sqrt_ks = [k for k, c in enumerate(ctx.cones)
                   if ctx.schur_syrk and c.has_sqrt_oracles]
        gemm_ks = [k for k in range(len(ctx.cones)) if k not in sqrt_ks]
        from hypatia_tpu.solvers.structures import (block_hess_prod,
                                                    block_sqrt_hess_prod)
        lhs = 0.0
        if sqrt_ks:
            UGQ2 = jnp.zeros_like(GQ2)
            for k in sqrt_ks:
                st, dim = ctx.cone_idxs[k]
                Uk = block_sqrt_hess_prod(ctx, i, k, GQ2[st:st + dim, :])
                UGQ2 = UGQ2.at[st:st + dim, :].set(Uk)
            lhs = UGQ2.T @ UGQ2
        if gemm_ks:
            HGQ2 = jnp.zeros_like(GQ2)
            for k in gemm_ks:
                st, dim = ctx.cone_idxs[k]
                from hypatia_tpu.solvers.structures import block_hess_prod
                Hk = block_hess_prod(ctx, i, k, GQ2[st:st + dim, :])
                HGQ2 = HGQ2.at[st:st + dim, :].set(Hk)
            gl = GQ2.T @ HGQ2
            lhs = lhs + (gl + gl.T) / 2
        return lhs

    out["assemble"] = _phase_ms(assemble, (data, ia))

    lhs = jax.jit(assemble)(data, ia)
    # factorization pieces on the real Schur matrix
    out["chol_shifted(cond4)"] = _phase_ms(
        lambda M: linalg.cholesky_shifted(M), (lhs,))
    out["chol_native"] = _phase_ms(lambda M: jnp.linalg.cholesky(M), (lhs,))
    L = jnp.linalg.cholesky(lhs)
    out["chol_inverse(trisolve+mm)"] = _phase_ms(
        lambda L: linalg.chol_inverse(L), (L,))
    eye = jnp.eye(nmp, dtype=L.dtype)
    out["trisolve_vs_I"] = _phase_ms(
        lambda L: linalg.solve_tri(L, eye, lower=True), (L,))
    out["matmul_nmp"] = _phase_ms(lambda M: M @ M, (lhs,))

    # sol_const: the constant-RHS 3x3 solve inside update_lhs
    sysd = jax.jit(lambda d, i: syssolvers.update_lhs(ctx, d, i))(data, ia)

    def sol_const(d, i):
        from hypatia_tpu.solvers.structures import block_hess_prod, blockwise
        rhs_const_z = blockwise(
            ctx, i, d["h"],
            lambda k, hk: block_hess_prod(ctx, i, k, hk))
        return syssolvers.solve_subsystem3(
            ctx, d, i, sysd, -d["c"], d["b"], rhs_const_z)

    out["sol_const3"] = _phase_ms(sol_const, (data, ia))

    for k, v in out.items():
        print(f"{k:28s} {v:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
