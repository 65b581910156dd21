"""Fully fused on-device solve loop.

The entire IPM iteration sequence — convergence parameters, termination
tests, KKT factorization, four direction solves with refinement, batched
curve search, slow-progress bookkeeping — runs inside one jitted
`lax.while_loop`.  Zero host synchronization until the solve finishes: the
TPU-native execution mode (SURVEY.md §3.1: "everything inside `while true`
should be one jitted, on-device program").

Status codes (mirroring the `Status` enum `Solvers.jl:34-49`):
0 = running, 1 = Optimal, 2 = PrimalInfeasible, 3 = DualInfeasible,
4 = IllPosed, 5 = SlowProgress, 6 = IterationLimit, 7 = NumericalFailure.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.solvers import steppers
from hypatia_tpu.solvers.structures import calc_mu

STATUS_CODES = {
    0: "SolveCalled", 1: "Optimal", 2: "PrimalInfeasible",
    3: "DualInfeasible", 4: "IllPosed", 5: "SlowProgress",
    6: "IterationLimit", 7: "NumericalFailure",
}


def check_convergence_device(ctx, tols, conv):
    """Termination tests on device (`Solvers.jl:485-528`). Returns int32
    status (0 = continue)."""
    eps = jnp.finfo(ctx.dtype).eps
    tau = conv["tau"]
    pobj_t, dobj_t = conv["primal_obj_t"], conv["dual_obj_t"]
    gap = conv["gap"]

    feas = jnp.maximum(jnp.maximum(conv["x_feas"], conv["y_feas"]),
                       conv["z_feas"])
    is_feas = feas <= tols["tol_feas"]
    is_abs = gap <= tols["tol_abs_opt"]
    is_rel = (jnp.minimum(gap / tau, jnp.abs(pobj_t - dobj_t))
              <= tols["tol_rel_opt"] * jnp.maximum(
                  tau, jnp.minimum(jnp.abs(pobj_t), jnp.abs(dobj_t))))
    optimal = is_feas & (is_abs | is_rel)

    pinf = (dobj_t > eps) & (conv["x_norm_res_t"]
                             <= tols["tol_infeas"] * dobj_t)
    dinf = (pobj_t < -eps) & (
        jnp.maximum(conv["y_norm_res_t"], conv["z_norm_res_t"])
        <= tols["tol_infeas"] * -pobj_t)
    illposed = (conv["mu"] <= tols["tol_illposed"]) & (
        tau <= tols["tol_illposed"] * jnp.minimum(1.0, conv["kap"]))

    status = jnp.where(optimal, 1, 0)
    status = jnp.where((status == 0) & pinf, 2, status)
    status = jnp.where((status == 0) & dinf, 3, status)
    status = jnp.where((status == 0) & illposed, 4, status)
    return status.astype(jnp.int32)


def make_body(ctx, conv_tols, tols, tol_slow=1e-3):
    """One fused IPM iteration as a pure carry -> carry function over
    (data, carry); reused by the single-instance loop and the batched
    (vmapped-body) loop."""
    from hypatia_tpu.solvers.solver import calc_convergence

    def body(data, carry):
        pt = carry["pt"]
        conv = calc_convergence(ctx, data, conv_tols, pt)

        # improvement metric (`Solvers.jl:460-476`)
        feas_now = jnp.stack([conv["x_feas"], conv["y_feas"],
                              conv["z_feas"], conv["tau_feas"]])
        prev = carry["prev_feas"]
        valid = jnp.isfinite(prev) & jnp.isfinite(feas_now)
        improv_terms = jnp.where(
            valid, (prev - feas_now) / (jnp.abs(prev) + 1e-300), -jnp.inf)
        improv = jnp.maximum(jnp.max(improv_terms), 0.0)

        status = check_convergence_device(ctx, tols, conv)

        # slow progress (3 consecutive low-improvement iters)
        is_slow = improv < tol_slow
        slow_trip = is_slow & carry["prev_slow"] & carry["prev2_slow"]
        status = jnp.where((status == 0) & slow_trip, 5, status)
        prev2_slow = carry["prev_slow"]
        prev_slow = is_slow

        def do_step(pt):
            residuals = {"x": conv["x"], "y": conv["y"], "z": conv["z"],
                         "tau": conv["tau_residual"]}
            cutoff = 1e-4 * jnp.maximum(
                jnp.maximum(conv["x_norm_res"], conv["y_norm_res"]),
                jnp.maximum(conv["z_norm_res"], conv["tau_feas"]))
            new_pt, info = steppers.step_combined(
                ctx, data, pt, residuals, cutoff,
                prev_sched=carry["sched_idx"])
            return new_pt, info["found"], info["worst_dir_res"], \
                info["sched_idx"]

        def no_step(pt):
            return (pt, jnp.asarray(True), jnp.zeros((), dtype=ctx.dtype),
                    carry["sched_idx"])

        new_pt, found, wdr, sched_idx = jax.lax.cond(
            status == 0, do_step, no_step, pt)

        mu_new = calc_mu(ctx, new_pt)
        bad = (~found) | (jnp.minimum(jnp.minimum(new_pt["tau"],
                                                  new_pt["kap"]), mu_new)
                          <= 0) | jnp.isnan(mu_new)
        status = jnp.where((status == 0) & bad, 7, status)
        # on failure keep the pre-step point
        new_pt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(status == 0, new, old), new_pt, pt)

        return {
            "pt": new_pt,
            "status": status,
            "it": carry["it"] + jnp.where(status == 0, 1, 0),
            "prev_feas": feas_now,
            "prev_slow": prev_slow,
            "prev2_slow": prev2_slow,
            "worst_dir_res": jnp.maximum(carry["worst_dir_res"], wdr),
            "sched_idx": sched_idx,
        }

    return body


def init_carry(ctx, pt0):
    return {
        "pt": pt0,
        "status": jnp.zeros((), dtype=jnp.int32),
        "it": jnp.zeros((), dtype=jnp.int32),
        "prev_feas": jnp.full(4, jnp.nan, dtype=ctx.dtype),
        "prev_slow": jnp.asarray(False),
        "prev2_slow": jnp.asarray(False),
        "worst_dir_res": jnp.zeros((), dtype=ctx.dtype),
        "sched_idx": jnp.zeros((), dtype=jnp.int32),
    }


def fused_solve(ctx, data, conv_tols, tols, pt0, iter_limit, tol_slow=1e-3):
    """Run the IPM to termination in one on-device while_loop.

    Returns (pt, status_code, num_iters, final_conv dict)."""
    from hypatia_tpu.solvers.solver import calc_convergence

    body_fn = make_body(ctx, conv_tols, tols, tol_slow)

    def cond(carry):
        return (carry["status"] == 0) & (carry["it"] < iter_limit)

    def body(carry):
        return body_fn(data, carry)

    carry0 = init_carry(ctx, pt0)
    out = jax.lax.while_loop(cond, body, carry0)
    status = jnp.where(out["status"] == 0, 6, out["status"])
    conv = calc_convergence(ctx, data, conv_tols, out["pt"])
    return out["pt"], status, out["it"], conv, out["worst_dir_res"]


@functools.partial(jax.jit, static_argnums=(0,))
def fused_solve_jit(ctx, data, conv_tols, tols, pt0, iter_limit,
                    tol_slow=1e-3):
    return fused_solve(ctx, data, conv_tols, tols, pt0, iter_limit, tol_slow)
