"""Interior-point stepping: RHS builders, on-device line search, steppers.

RHS builders mirror `src/Solvers/steppers/common.jl:7-118`; the combined
stepper mirrors `steppers/combined.jl` (default: 4 directions per iteration
and a single curve search over the quadratic combination); the
predict-or-center stepper mirrors `steppers/predorcent.jl`.

TPU-native design choice: the reference's sequential backtracking line search
(`search.jl:46-69`, up to 18 candidate alphas tried one at a time with
early-exit per cone) is replaced by a **batched candidate search**: all alphas
in the schedule are checked in parallel with `vmap`, then the largest passing
alpha is selected. Acceptance of a candidate is a pure conjunction, so the
result is identical to the sequential search.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.solvers.structures import (
    calc_mu,
    cone_view,
    compute_iter_aux,
    point_vec,
    primal_dual_views,
)
from hypatia_tpu.ops import linalg
from hypatia_tpu.solvers import syssolvers


# ---------------------------------------------------------------------------
# RHS builders
# ---------------------------------------------------------------------------


def zeros_rhs(ctx):
    return {
        "x": jnp.zeros(ctx.n, dtype=ctx.dtype),
        "y": jnp.zeros(ctx.p, dtype=ctx.dtype),
        "z": jnp.zeros(ctx.q, dtype=ctx.dtype),
        "s": jnp.zeros(ctx.q, dtype=ctx.dtype),
        "tau": jnp.zeros((), dtype=ctx.dtype),
        "kap": jnp.zeros((), dtype=ctx.dtype),
    }


def update_rhs_pred(ctx, iter_aux, residuals, pt):
    """Prediction RHS = affine residuals (`steppers/common.jl:7-23`)."""
    rhs = zeros_rhs(ctx)
    rhs["x"] = residuals["x"]
    rhs["y"] = residuals["y"]
    rhs["z"] = residuals["z"]
    rhs["tau"] = residuals["tau"]
    s = rhs["s"]
    for k in range(len(ctx.cones)):
        start, dim = ctx.cone_idxs[k]
        s = s.at[start:start + dim].set(-iter_aux["duals"][k])
    rhs["s"] = s
    rhs["kap"] = -pt["kap"]
    return rhs


def update_rhs_cent(ctx, iter_aux, pt):
    """Centering RHS (`steppers/common.jl:62-82`)."""
    rhs = zeros_rhs(ctx)
    rtmu = jnp.sqrt(iter_aux["mu"])
    s = rhs["s"]
    for k in range(len(ctx.cones)):
        start, dim = ctx.cone_idxs[k]
        val = -iter_aux["duals"][k] - rtmu * iter_aux["grads"][k]
        s = s.at[start:start + dim].set(val)
    rhs["s"] = s
    rhs["kap"] = -pt["kap"] + iter_aux["mu"] / pt["tau"]
    return rhs


def _adj_rhs_s(ctx, iter_aux, direc, centering):
    """Shared third-order adjustment s-RHS with the dder3 identity gate
    (`steppers/common.jl:26-59` predadj, `:85-118` centadj)."""
    mu = iter_aux["mu"]
    irtrtmu = 1.0 / jnp.sqrt(jnp.sqrt(mu))
    s_out = jnp.zeros(ctx.q, dtype=ctx.dtype)
    for k, cone in enumerate(ctx.cones):
        if not cone.has_dder3:
            continue
        start, dim = ctx.cone_idxs[k]
        prim_dir, _ = primal_dual_views(ctx, direc["z"], direc["s"], k)
        val = cone.adj_gated_val(iter_aux["s_scals"][k], prim_dir, irtrtmu,
                                 centering, iter_aux["auxes"][k])
        s_out = s_out.at[start:start + dim].set(val)
    return s_out


def update_rhs_predadj(ctx, iter_aux, pt, direc):
    rhs = zeros_rhs(ctx)
    rhs["s"] = _adj_rhs_s(ctx, iter_aux, direc, centering=False)
    taubar = pt["tau"]
    tdt = direc["tau"] / taubar
    rhs["kap"] = tdt * iter_aux["mu"] / taubar * (1 + tdt)
    return rhs


def update_rhs_centadj(ctx, iter_aux, pt, direc):
    rhs = zeros_rhs(ctx)
    rhs["s"] = _adj_rhs_s(ctx, iter_aux, direc, centering=True)
    taubar = pt["tau"]
    tdt = direc["tau"] / taubar
    rhs["kap"] = tdt * iter_aux["mu"] / taubar * tdt
    return rhs


# ---------------------------------------------------------------------------
# candidate acceptance check (batched line search)
# ---------------------------------------------------------------------------


def check_cone_points(ctx, z, s, tau, kap):
    """Candidate acceptance test (`search.jl:74-138`). Returns (ok, proxsqr).

    All conditions are phrased positively so NaNs (from oracles at infeasible
    candidates) propagate to a False verdict.
    """
    eps = jnp.finfo(ctx.dtype).eps
    min_prox = ctx.min_prox
    proxsqr_bound = ctx.prox_bound**2

    taukap = tau * kap
    ok = (tau > eps) & (kap > eps) & (taukap > eps)

    # per-primitive-cone <s,z> parts (BatchedCone groups report one entry
    # per sub-cone so the windows below keep reference granularity)
    sz_parts = []
    nu_parts = []
    for k, cone in enumerate(ctx.cones):
        primal_k, dual_k = primal_dual_views(ctx, z, s, k)
        sz_parts.append(cone.sz_parts(primal_k, dual_k))
        nu_parts.append(jnp.asarray(cone.nu_parts(), dtype=ctx.dtype))
    szs = jnp.concatenate(sz_parts)
    nus = jnp.concatenate(nu_parts)
    ok = ok & jnp.all(szs >= eps)

    mu = (jnp.sum(szs) + taukap) / (ctx.nu + 1)
    ok = ok & (mu >= eps)
    mu_safe = jnp.where(mu >= eps, mu, jnp.ones((), dtype=ctx.dtype))

    taukap_rel = taukap / mu_safe
    taukap_proxsqr = (taukap_rel - 1) ** 2
    ok = ok & (taukap_rel >= min_prox) & (taukap_proxsqr <= proxsqr_bound)

    sz_rel = szs / (mu_safe * nus)
    ok = ok & jnp.all(sz_rel >= min_prox) \
        & jnp.all(nus * (sz_rel - 1) ** 2 <= proxsqr_bound)

    irtmu = 1.0 / jnp.sqrt(mu_safe)
    proxs = [taukap_proxsqr]
    for k, cone in enumerate(ctx.cones):
        primal_k, dual_k = primal_dual_views(ctx, z, s, k)
        s_scal = irtmu * primal_k
        aux = cone.point_aux_light(s_scal)
        ok = ok & cone.feas(s_scal) & cone.dual_feas(dual_k)
        ok = ok & cone.check_numerics(s_scal, dual_k, aux)
        proxs.append(
            cone.get_proxsqr(s_scal, dual_k, irtmu, aux, ctx.use_max_prox))
    if ctx.use_max_prox:
        agg = jnp.stack(proxs).max()
    else:
        agg = jnp.stack(proxs).sum()
    ok = ok & (agg <= proxsqr_bound)
    return ok, agg


def make_candidate(ctx, pt, dirs, alpha, mode, full=False):
    """Candidate point for a given step mode.

    Modes (combined stepper, `combined.jl:124-171`):
      0: comb-adj   pt + a*pred + a^2*predadj + (1-a)*cent + (1-a)^2*centadj
      1: comb-unadj pt + a*pred + (1-a)*cent
      2: cent-adj   pt + a*cent + a^2*centadj
      3: cent-unadj pt + a*cent
    Modes (predorcent stepper, `predorcent.jl:185-199`, curve search):
      4: dir-adj    pt + a*dir + a^2*dir_adj
      3: dir-unadj  pt + a*dir  (reuses slot 'cent' for the unadjusted dir)
    """
    keys = ("x", "y", "z", "s", "tau", "kap") if full else ("z", "s", "tau", "kap")
    out = {}
    am1 = 1 - alpha
    for key in keys:
        v = pt[key]
        if mode == 0:
            v = (v + alpha * dirs["pred"][key] + alpha**2 * dirs["predadj"][key]
                 + am1 * dirs["cent"][key] + am1**2 * dirs["centadj"][key])
        elif mode == 1:
            v = v + alpha * dirs["pred"][key] + am1 * dirs["cent"][key]
        elif mode == 2:
            v = v + alpha * dirs["cent"][key] + alpha**2 * dirs["centadj"][key]
        elif mode == 3:
            v = v + alpha * dirs["cent"][key]
        elif mode == 4:
            v = v + alpha * dirs["cent"][key] + alpha**2 * dirs["centadj"][key]
        elif mode == 5:
            # two-search adjustment: adj factor alpha * unadj_alpha
            # (`predorcent.jl:185-199`, non-curve branch)
            v = (v + alpha * dirs["cent"][key]
                 + alpha * dirs["unadj_alpha"] * dirs["centadj"][key])
        else:
            raise ValueError(mode)
        out[key] = v
    return out


def search_alpha(ctx, pt, dirs, mode, start_idx=None):
    """Batched backtracking search: candidate alphas checked in parallel,
    return (found, alpha, proxsqr, sched_idx) for the largest passing alpha.

    With `start_idx` (traced int32, from a warm start — reference
    `combined.jl:173-176` start_sched), only a fixed window of the schedule
    starting there is checked; if none in the window pass, fall back to the
    full batched search. `start_idx=None` checks the full schedule."""
    alphas = jnp.asarray(ctx.alpha_sched, dtype=ctx.dtype)
    n_sched = alphas.shape[0]

    def check_one(alpha):
        cand = make_candidate(ctx, pt, dirs, alpha, mode, full=False)
        return check_cone_points(ctx, cand["z"], cand["s"], cand["tau"],
                                 cand["kap"])

    def full_search():
        with linalg.blocked_scope():
            # vmapped candidate checks: the blocked factorizations
            # vectorize over the alpha lanes (native chol serializes)
            oks, proxs = jax.vmap(check_one)(alphas)
        found = jnp.any(oks)
        # first True = largest alpha (schedule descending)
        idx = jnp.argmax(oks)
        alpha = jnp.where(found, alphas[idx], jnp.zeros((), dtype=ctx.dtype))
        proxsqr = jnp.where(found, proxs[idx],
                            jnp.zeros((), dtype=ctx.dtype))
        return found, alpha, proxsqr, idx.astype(jnp.int32)

    if start_idx is None:
        return full_search()

    window = min(8, n_sched)
    start = jnp.clip(start_idx, 0, n_sched - window)

    def window_search():
        w_alphas = jax.lax.dynamic_slice(alphas, (start,), (window,))
        with linalg.blocked_scope():
            oks, proxs = jax.vmap(check_one)(w_alphas)
        found = jnp.any(oks)
        idx = jnp.argmax(oks)
        alpha = jnp.where(found, w_alphas[idx],
                          jnp.zeros((), dtype=ctx.dtype))
        proxsqr = jnp.where(found, proxs[idx],
                            jnp.zeros((), dtype=ctx.dtype))
        return found, alpha, proxsqr, (start + idx).astype(jnp.int32)

    res_w = window_search()
    return jax.lax.cond(res_w[0], lambda: res_w, full_search)


def _search_cascade(ctx, pt, dirs, modes, start_idx=None):
    """Try step modes in order, stopping at the first that admits a positive
    alpha (`combined.jl:86-113` fallback chain). The warm start (if any)
    applies to the first mode only; fallback modes search the full schedule.
    Returns (found, alpha, proxsqr, mode_idx, sched_idx)."""

    def try_mode(i):
        found, alpha, proxsqr, sidx = search_alpha(
            ctx, pt, dirs, modes[i], start_idx if i == 0 else None)
        mode_arr = jnp.asarray(modes[i])
        if i + 1 == len(modes):
            return found, alpha, proxsqr, mode_arr, sidx
        return jax.lax.cond(
            found,
            lambda: (found, alpha, proxsqr, mode_arr, sidx),
            lambda: try_mode(i + 1),
        )

    return try_mode(0)


# ---------------------------------------------------------------------------
# steppers
# ---------------------------------------------------------------------------


def step_combined(ctx, data, pt, residuals, res_norm_cutoff,
                  prev_sched=None):
    """One iteration of the combined stepper (`combined.jl:53-122`).

    `prev_sched` (traced int32) warm-starts the line search from the
    previous accepted schedule index when `ctx.shift_sched > 0`
    (`combined.jl:173-176`).

    Returns (new_point, info) where info carries alpha/prox/worst_dir_res/
    step-mode/failure flags as device scalars.
    """
    iter_aux = compute_iter_aux(ctx, pt)
    sys = syssolvers.update_lhs(ctx, data, iter_aux)

    getdir = lambda rhs: syssolvers.get_directions(
        ctx, data, iter_aux, sys, rhs, res_norm_cutoff)

    import os as _os
    if _os.environ.get("HYPATIA_TPU_BATCHED_GETDIR", "0").lower() \
            not in ("0", "false"):
        # Opt-in 2x2 batched direction solves: (cent, pred) are
        # independent, as are (centadj, predadj) given the first pair —
        # vmapping each pair halves the sequential depth of the
        # latency-bound solve/refinement chains AND halves the inlined
        # program copies (4 -> 2).  Off by default: flipping the trace
        # invalidates every cached TPU program (the A/B arm measures it).
        def _stack2(a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.stack([x, y]), a, b)

        def _unstack2(t):
            return (jax.tree_util.tree_map(lambda x: x[0], t),
                    jax.tree_util.tree_map(lambda x: x[1], t))

        vget = jax.vmap(getdir)
        d01, rn01 = vget(_stack2(update_rhs_cent(ctx, iter_aux, pt),
                                 update_rhs_pred(ctx, iter_aux,
                                                 residuals, pt)))
        dir_cent, dir_pred = _unstack2(d01)
        d23, rn23 = vget(_stack2(
            update_rhs_centadj(ctx, iter_aux, pt, dir_cent),
            update_rhs_predadj(ctx, iter_aux, pt, dir_pred)))
        dir_centadj, dir_predadj = _unstack2(d23)
        worst_dir_res = jnp.maximum(jnp.max(rn01), jnp.max(rn23))
    else:
        dir_cent, rn1 = getdir(update_rhs_cent(ctx, iter_aux, pt))
        dir_centadj, rn2 = getdir(
            update_rhs_centadj(ctx, iter_aux, pt, dir_cent))
        dir_pred, rn3 = getdir(update_rhs_pred(ctx, iter_aux, residuals, pt))
        dir_predadj, rn4 = getdir(
            update_rhs_predadj(ctx, iter_aux, pt, dir_pred))
        worst_dir_res = jnp.max(jnp.stack([rn1, rn2, rn3, rn4]))

    dirs = {"cent": dir_cent, "centadj": dir_centadj,
            "pred": dir_pred, "predadj": dir_predadj}

    modes = (0, 1, 2, 3) if ctx.use_adjustment else (1, 3)
    start_idx = None
    if ctx.shift_sched > 0 and prev_sched is not None:
        start_idx = jnp.maximum(prev_sched - ctx.shift_sched, 0)
    found, alpha, proxsqr, mode, sched_idx = _search_cascade(
        ctx, pt, dirs, modes, start_idx)

    branches = [
        lambda m=m: make_candidate(ctx, pt, dirs, alpha, m, full=True)
        for m in (0, 1, 2, 3)
    ]
    mode_to_branch = {0: 0, 1: 1, 2: 2, 3: 3}
    new_pt = jax.lax.switch(mode, [branches[mode_to_branch[m]] for m in range(4)])
    # if no step found, keep the old point (host will mark NumericalFailure)
    new_pt = jax.tree_util.tree_map(
        lambda new, old: jnp.where(found, new, old), new_pt, pt)

    info = {
        "alpha": alpha,
        "prox": jnp.sqrt(proxsqr),
        "worst_dir_res": worst_dir_res,
        "mode": mode,
        "found": found,
        "sched_idx": sched_idx,
        "schur_ok": sys.get("schur_ok", jnp.asarray(True)),
    }
    return new_pt, info


def step_predorcent(ctx, data, pt, residuals, res_norm_cutoff, is_pred):
    """One iteration of the predict-or-center stepper
    (`predorcent.jl:72-166`, curve-search variant).

    `is_pred` is a traced boolean decided by the host from the previous
    proximity and centering-step count (`predorcent.jl:83-85`).
    """
    iter_aux = compute_iter_aux(ctx, pt)
    sys = syssolvers.update_lhs(ctx, data, iter_aux)

    getdir = lambda rhs: syssolvers.get_directions(
        ctx, data, iter_aux, sys, rhs, res_norm_cutoff)

    rhs_noadj = jax.lax.cond(
        is_pred,
        lambda: update_rhs_pred(ctx, iter_aux, residuals, pt),
        lambda: update_rhs_cent(ctx, iter_aux, pt),
    )
    dir_noadj, rn1 = getdir(rhs_noadj)

    if ctx.use_adjustment:
        rhs_adj = jax.lax.cond(
            is_pred,
            lambda: update_rhs_predadj(ctx, iter_aux, pt, dir_noadj),
            lambda: update_rhs_centadj(ctx, iter_aux, pt, dir_noadj),
        )
        dir_adj, rn2 = getdir(rhs_adj)
        worst_dir_res = jnp.maximum(rn1, rn2)
        dirs = {"cent": dir_noadj, "centadj": dir_adj,
                "pred": dir_noadj, "predadj": dir_adj,
                "unadj_alpha": jnp.zeros((), dtype=ctx.dtype)}
        if ctx.use_curve_search:
            modes = (4, 3)  # curve search with adjustment, then unadjusted
        else:
            modes = None  # two-search logic below
    else:
        worst_dir_res = rn1
        dirs = {"cent": dir_noadj, "centadj": dir_noadj,
                "pred": dir_noadj, "predadj": dir_noadj,
                "unadj_alpha": jnp.zeros((), dtype=ctx.dtype)}
        modes = (3,)

    if modes is not None:
        found, alpha, proxsqr, mode, _ = _search_cascade(ctx, pt, dirs,
                                                         modes)
    else:
        # two line searches (`predorcent.jl:108-146`): first unadjusted,
        # then adjusted with factor alpha * unadj_alpha; fall back to the
        # unadjusted result if the adjusted search fails
        found_u, alpha_u, prox_u, _ = search_alpha(ctx, pt, dirs, 3)
        dirs["unadj_alpha"] = alpha_u
        found_a, alpha_a, prox_a, _ = search_alpha(ctx, pt, dirs, 5)
        use_adj = found_u & found_a
        found = found_u
        alpha = jnp.where(use_adj, alpha_a, alpha_u)
        proxsqr = jnp.where(use_adj, prox_a, prox_u)
        mode = jnp.where(use_adj, 5, 3)

    branches = [
        lambda m=m: make_candidate(ctx, pt, dirs, alpha, m, full=True)
        for m in range(6)
    ]
    new_pt = jax.lax.switch(mode, branches)
    new_pt = jax.tree_util.tree_map(
        lambda new, old: jnp.where(found, new, old), new_pt, pt)

    info = {
        "alpha": alpha,
        "prox": jnp.sqrt(proxsqr),
        "worst_dir_res": worst_dir_res,
        "mode": mode,
        "found": found,
        "schur_ok": sys.get("schur_ok", jnp.asarray(True)),
    }
    return new_pt, info
