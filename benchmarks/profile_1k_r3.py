"""Round-3: per-phase profile of the MXU-scale LP (linearopt m=1000
n=2000, Schur dim 1000) on TPU, plus a finer decomposition of upfact
(assembly matmul vs factorization vs explicit inverse) to pick the next
kernel lever. Reference phase semantics: `Solvers.jl:87-96`.

Run:  python benchmarks/profile_1k_r3.py  (claims the TPU; keep it
single-client).
"""

import json
import time

import jax
import jax.numpy as jnp

import examples
from hypatia_tpu import Solver
from hypatia_tpu.ops import linalg
from hypatia_tpu.solvers import syssolvers
from hypatia_tpu.solvers.profile import profile_phases, _phase_ms


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m, n = 1000, 2000
    model = examples.linearopt.build(m=m, n=n, seed=1)
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(model)
    t0 = time.time()
    s.solve()
    print(json.dumps({"status": s.get_status(), "iters": s.get_num_iters(),
                      "step_s": round(s.timers.get("step", 0.0), 3),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

    phases = profile_phases(s)
    print("phases:", json.dumps(phases), flush=True)

    # upfact decomposition at the real Schur matrix
    ctx, data = s.ctx, s.data
    from hypatia_tpu.solvers.structures import compute_iter_aux
    iter_aux = jax.jit(lambda pt: compute_iter_aux(ctx, pt))(s.final_point)
    lhs_sys = jax.jit(lambda d, ia: syssolvers.update_lhs(ctx, d, ia))(
        data, iter_aux)
    lhs = lhs_sys["schur_chol"] @ lhs_sys["schur_chol"].T  # SPD, right scale
    d = {}
    d["fact_and_inv_ms"] = _phase_ms(
        lambda A: linalg.cholesky_shifted_and_inv(A), (lhs,))
    d["fact_only_ms"] = _phase_ms(
        lambda A: linalg.cholesky_shifted(A), (lhs,))
    GQ2 = data["GQ2"]
    H = jnp.ones((GQ2.shape[0],), dtype=GQ2.dtype)
    d["assembly_gemm_ms"] = _phase_ms(
        lambda G, h: G.T @ (h[:, None] * G), (GQ2, H))
    eye = jnp.eye(lhs.shape[-1], dtype=lhs.dtype)
    d["schur_matvec_solve_ms"] = _phase_ms(
        lambda inv, r: inv @ r, (lhs_sys["schur_inv"], eye[:, 0]))
    print("upfact decomposition:", json.dumps(
        {k: round(v, 3) for k, v in d.items()}), flush=True)


if __name__ == "__main__":
    main()
