"""Diagnostics: explain line-search candidate acceptance per condition.

Development utility — replays `check_cone_points` (`search.jl:74-138`
semantics) with each subcondition reported separately.
"""

import numpy as np
import jax.numpy as jnp

from hypatia_tpu.solvers.structures import primal_dual_views


def explain_candidate(ctx, z, s, tau, kap):
    eps = np.finfo(np.float64).eps
    out = {}
    taukap = float(tau * kap)
    out["tau>eps"] = float(tau) > eps
    out["kap>eps"] = float(kap) > eps
    out["taukap>eps"] = taukap > eps
    # per-primitive-cone parts (BatchedCone groups report one entry per
    # sub-cone, matching check_cone_points' windows)
    szs, nus = [], []
    for k, cone in enumerate(ctx.cones):
        pk, dk = primal_dual_views(ctx, z, s, k)
        parts = np.asarray(cone.sz_parts(pk, dk))
        szs.append(parts)
        nus.append(np.asarray(cone.nu_parts()))
        out[f"c{k}_sz>=eps"] = bool(np.all(parts >= eps))
    mu = (sum(float(p.sum()) for p in szs) + taukap) / (ctx.nu + 1)
    out["mu"] = mu
    out["taukap_rel"] = taukap / mu
    out["taukap_rel>=minprox"] = taukap / mu >= ctx.min_prox
    out["taukap_proxsqr<=bound"] = (taukap / mu - 1) ** 2 <= ctx.prox_bound**2
    irtmu = 1 / np.sqrt(abs(mu))
    aggs = [(taukap / mu - 1) ** 2]
    for k, cone in enumerate(ctx.cones):
        pk, dk = primal_dual_views(ctx, z, s, k)
        sz_rel = szs[k] / (mu * nus[k])
        out[f"c{k}_szrel_window"] = bool(
            np.all(sz_rel >= ctx.min_prox)
            and np.all(nus[k] * (sz_rel - 1) ** 2 <= ctx.prox_bound**2))
        ss = irtmu * pk
        aux = cone.point_aux(ss)
        out[f"c{k}_feas"] = bool(cone.feas(ss))
        out[f"c{k}_dual_feas"] = bool(cone.dual_feas(dk))
        out[f"c{k}_numerics"] = bool(cone.check_numerics(ss, dk, aux))
        p = float(cone.get_proxsqr(ss, dk, irtmu, aux, ctx.use_max_prox))
        out[f"c{k}_proxsqr"] = p
        aggs.append(p)
    agg = max(aggs) if ctx.use_max_prox else sum(aggs)
    out["agg_proxsqr"] = agg
    out["agg<=bound"] = agg <= ctx.prox_bound**2
    return out
