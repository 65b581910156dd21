"""KKT system solvers (functional, on-device).

The 6x6 nonsymmetric HSDE system in (x, y, z, tau, s, kap)
(`src/Solvers/systemsolvers/common.jl:4-11`):

    A'*y + G'*z + c*tau           = xrhs
    -A*x + b*tau                  = yrhs
    -G*x + h*tau - s              = zrhs
    -c'*x - b'*y - h'*z - kap     = taurhs
    (pr) z_k + mu*H_k*s_k         = srhs_k     [mu*H = H at the scaled point]
    (du) mu*H_k*z_k + s_k         = srhs_k
    mu/tau_bar^2*tau + kap        = kaprhs

Three strategies (reference hierarchy `naive.jl` / `symindef.jl` /
`qrchol.jl`), all reduced to TPU-supported factorizations:

- ``naive``:    full 6x6 dense solve via QR (validation baseline; the
                reference uses LAPACK LU, which has no f64 TPU path).
- ``symindef``: eliminate s, kap, tau -> 3x3 symmetric indefinite
                [0 A' G'; A 0 0; G 0 -Hbar], solved via QR.
- ``qrchol``:   default/performance path; further reduce to the
                (n-p)x(n-p) SPD Schur complement GQ2' Hbar GQ2 and a dense
                Cholesky (cf. CVXOPT S10.3; `qrchol.jl:5-9`). All heavy ops
                are MXU matmuls + one Cholesky per iteration.

The 6->4->3 lifting (two-RHS trick for tau) follows
`systemsolvers/common.jl:129-211`.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hypatia_tpu.ops import linalg
from hypatia_tpu.solvers import shard
from hypatia_tpu.solvers.structures import (
    block_hess_prod,
    block_sqrt_hess_prod,
    blockwise,
    cone_view,
    point_vec,
    primal_dual_views,
    zero_point,
)


# ---------------------------------------------------------------------------
# 6x6 residual operator (for iterative refinement)
# ---------------------------------------------------------------------------


def apply_lhs(ctx, data, iter_aux, direc):
    """Compute LHS*dir for the 6x6 system (`systemsolvers/common.jl:79-121`)."""
    A, G, c, b, h = data["A"], data["G"], data["c"], data["b"], data["h"]
    tau_dir, kap_dir = direc["tau"], direc["kap"]

    res_x = c * tau_dir + G.T @ direc["z"]
    if ctx.p > 0:
        res_x = res_x + A.T @ direc["y"]
        res_y = b * tau_dir - A @ direc["x"]
    else:
        res_y = jnp.zeros(0, dtype=ctx.dtype)
    res_z = h * tau_dir - direc["s"] - G @ direc["x"]
    res_tau = -jnp.dot(c, direc["x"]) - jnp.dot(h, direc["z"]) - kap_dir
    if ctx.p > 0:
        res_tau = res_tau - jnp.dot(b, direc["y"])

    # s rows: H_k(primal_dir_k) + dual_dir_k at the scaled point
    res_s = jnp.zeros(ctx.q, dtype=ctx.dtype)
    for k, cone in enumerate(ctx.cones):
        pd_k, dd_k = primal_dual_views(ctx, direc["z"], direc["s"], k)
        Hpd = cone.hess_prod(iter_aux["s_scals"][k], pd_k, iter_aux["auxes"][k])
        start, dim = ctx.cone_idxs[k]
        res_s = res_s.at[start:start + dim].set(Hpd + dd_k)

    tau = iter_aux["tau"]
    res_kap = iter_aux["mu"] / tau * tau_dir / tau + kap_dir

    return {"x": res_x, "y": res_y, "z": res_z, "s": res_s,
            "tau": res_tau, "kap": res_kap}


# ---------------------------------------------------------------------------
# update_lhs: per-iteration factorizations + constant-RHS solution
# ---------------------------------------------------------------------------


def update_lhs(ctx, data, iter_aux):
    """Build/factor the reduced LHS and solve the constant (-c, b, h) system
    used by the tau lift (`common.jl:154-208`, `qrchol.jl:181-197`)."""
    sys = {}
    if ctx.syssolver == "qrchol":
        GQ2 = data["GQ2"]
        # Schur complement: sum_k GQ2_k' Hbar_k GQ2_k  (`qrchol.jl:219-246`).
        # Cones with sqrt oracles contribute in syrk form (U_k GQ2_k)'
        # (U_k GQ2_k) — PSD by construction and better-conditioned, the
        # reference's default when sqrt oracles exist (`qrchol.jl:219-237`);
        # the rest contribute via the gemm form GQ2_k' (H_k GQ2_k). Rows not
        # owned by a form are zero, so each form is one full-width matmul.
        sqrt_ks = [k for k, c in enumerate(ctx.cones)
                   if ctx.schur_syrk and c.has_sqrt_oracles]
        gemm_ks = [k for k in range(len(ctx.cones)) if k not in sqrt_ks]
        import os as _os
        # Fold the two forms into one matmul only when the assembly is
        # FLOP-relevant (q*(n-p)^2 >= 2^24): at small sizes both matmuls
        # are latency-bound so the fold buys nothing, and its (tiny)
        # summation-order roundoff change can flip borderline trajectories
        # (observed: conditionnum side=3 Optimal/10 -> NearOptimal/25).
        nm = GQ2.shape[1]
        flop_relevant = ctx.q * nm * nm >= (1 << 24)
        mixed = (bool(sqrt_ks) and bool(gemm_ks) and flop_relevant
                 and not _os.environ.get("HYPATIA_TPU_NO_SCHUR_FOLD"))
        UGQ2 = jnp.zeros_like(GQ2) if sqrt_ks else None
        for k in sqrt_ks:
            start, dim = ctx.cone_idxs[k]
            Uk = block_sqrt_hess_prod(ctx, iter_aux, k,
                                      GQ2[start:start + dim, :])
            UGQ2 = UGQ2.at[start:start + dim, :].set(Uk)
        HGQ2 = jnp.zeros_like(GQ2) if gemm_ks else None
        for k in gemm_ks:
            start, dim = ctx.cone_idxs[k]
            Hk = block_hess_prod(ctx, iter_aux, k, GQ2[start:start + dim, :])
            HGQ2 = HGQ2.at[start:start + dim, :].set(Hk)
        if mixed:
            # fold both forms into ONE full-width matmul: with L = UGQ2 +
            # GQ2 masked to the gemm rows and R = UGQ2 + HGQ2, the row
            # supports of the two forms are disjoint, so every syrk/gemm
            # cross term in L'R vanishes exactly and L'R = UGQ2'UGQ2 +
            # GQ2_g' HGQ2_g — half the assembly FLOPs of two zero-padded
            # full-width matmuls (the q x (n-p)^2 syrk is the dominant
            # assembly cost at MXU scale). A/B switch:
            # HYPATIA_TPU_NO_SCHUR_FOLD restores the two-matmul form.
            gmask = np.zeros((ctx.q, 1))
            for k in gemm_ks:
                start, dim = ctx.cone_idxs[k]
                gmask[start:start + dim] = 1.0
            # trace-time constant mask: one fused multiply-add, no
            # per-group dynamic-update-slice chain
            pairs = [(UGQ2 + jnp.asarray(gmask, dtype=GQ2.dtype) * GQ2,
                      UGQ2 + HGQ2)]
        elif bool(sqrt_ks) and bool(gemm_ks):
            pairs = [(UGQ2, UGQ2), (GQ2, HGQ2)]  # unfolded (A/B switch)
        elif sqrt_ks:
            pairs = [(UGQ2, UGQ2)]
        else:
            pairs = [(GQ2, HGQ2)]

        def accumulate(pairs):
            lhs = 0.0
            for Lmat, Rmat in pairs:
                lhs = lhs + Lmat.T @ Rmat
            # the gemm form needs explicit symmetrization (H_k products
            # are only symmetric up to roundoff); the syrk part is exactly
            # symmetric already, so the global symmetrization is harmless
            return (lhs + lhs.T) / 2

        if ctx.shard_axis is not None:
            # row-shard the cone axis (zero-padded to the device count):
            # each device syrks its local block rows, XLA all-reduces
            # (psum) the (n-p)^2 partial sums over the mesh; the
            # factorization below is replicated
            ndev = len(ctx.mesh_key[1])
            pad = (-GQ2.shape[0]) % ndev

            def padc(M):
                Mp = jnp.pad(M, ((0, pad), (0, 0)))
                return shard.constrain(Mp, ctx.shard_axis, None)

            lhs = accumulate([(padc(L_), padc(R_)) for L_, R_ in pairs])
            lhs = shard.constrain(lhs, None, None)
        else:
            lhs = accumulate(pairs)
        # factorization: on TPU the native chol+inverse is latency-bound
        # (8.7 ms at n=128); the blocked combined kernel is 3.6 ms
        # (auto_blocked_schur policy + measurements)
        with linalg.blocked_scope(linalg.auto_blocked_schur(lhs)
                                  or linalg.in_blocked_scope()):
            L, inv, ok = linalg.cholesky_shifted_and_inv(lhs)
        sys["schur_chol"] = L
        sys["schur_inv"] = inv
        sys["schur_ok"] = ok
        if ctx.schur_acc_solve == "inv_corr":
            sys["schur_lhs"] = lhs  # corrections go through the matrix
    elif ctx.syssolver == "symindef":
        npq = ctx.n + ctx.p + ctx.q
        A, G = data["A"], data["G"]
        lhs = jnp.zeros((npq, npq), dtype=ctx.dtype)
        lhs = lhs.at[ctx.n:ctx.n + ctx.p, :ctx.n].set(A)
        lhs = lhs.at[:ctx.n, ctx.n:ctx.n + ctx.p].set(A.T)
        lhs = lhs.at[ctx.n + ctx.p:, :ctx.n].set(G)
        lhs = lhs.at[:ctx.n, ctx.n + ctx.p:].set(G.T)
        zs = ctx.n + ctx.p
        for k, cone in enumerate(ctx.cones):
            start, dim = ctx.cone_idxs[k]
            s_scal = iter_aux["s_scals"][k]
            aux = iter_aux["auxes"][k]
            Hk = cone.hess(s_scal, aux) if cone.use_dual else cone.inv_hess(s_scal, aux)
            lhs = lhs.at[zs + start:zs + start + dim,
                         zs + start:zs + start + dim].set(-Hk)
        Q, R = jnp.linalg.qr(lhs)
        sys["lhs_inv"] = linalg.solve_tri(R, Q.T, lower=False)
    elif ctx.syssolver == "naive":
        lhs6 = _naive_lhs6(ctx, data, iter_aux)
        Q, R = jnp.linalg.qr(lhs6)
        sys["lhs_inv"] = linalg.solve_tri(R, Q.T, lower=False)
    elif ctx.syssolver == "naiveelim":
        lhs4 = _naiveelim_lhs4(ctx, data, iter_aux)
        Q, R = jnp.linalg.qr(lhs4)
        sys["lhs_inv"] = linalg.solve_tri(R, Q.T, lower=False)
    elif ctx.syssolver == "symindef_indirect":
        pass  # matrix-free; nothing to factor
    else:
        raise ValueError(ctx.syssolver)

    if ctx.syssolver in ("qrchol", "symindef", "symindef_indirect"):
        # constant-RHS 3x3 solve for the tau lift
        if ctx.syssolver == "qrchol":
            rhs_const_z = blockwise(
                ctx, iter_aux, data["h"],
                lambda k, hk: block_hess_prod(ctx, iter_aux, k, hk))
        else:
            rhs_const_z = data["h"]  # symindef variants
        sol_const = solve_subsystem3(
            ctx, data, iter_aux, sys, -data["c"], data["b"], rhs_const_z)
        sys["sol_const"] = sol_const
    return sys


def _naive_lhs6(ctx, data, iter_aux):
    """Materialize the full 6x6 LHS (`naive.jl:144-216` semantics)."""
    n, p, q = ctx.n, ctx.p, ctx.q
    A, G, c, b, h = data["A"], data["G"], data["c"], data["b"], data["h"]
    dim = n + p + q + 1 + q + 1
    xs, ys, zs = 0, n, n + p
    ts = n + p + q
    ss = ts + 1
    ks = ss + q
    M = jnp.zeros((dim, dim), dtype=ctx.dtype)
    # x-row: A'y + G'z + c*tau
    M = M.at[xs:ys, ys:zs].set(A.T)
    M = M.at[xs:ys, zs:ts].set(G.T)
    M = M.at[xs:ys, ts].set(c)
    # y-row: -A x + b*tau
    M = M.at[ys:zs, xs:ys].set(-A)
    M = M.at[ys:zs, ts].set(b)
    # z-row: -G x + h*tau - s
    M = M.at[zs:ts, xs:ys].set(-G)
    M = M.at[zs:ts, ts].set(h)
    M = M.at[zs:ts, ss:ks].set(-jnp.eye(q, dtype=ctx.dtype))
    # tau-row: -c'x - b'y - h'z - kap
    M = M.at[ts, xs:ys].set(-c)
    M = M.at[ts, ys:zs].set(-b)
    M = M.at[ts, zs:ts].set(-h)
    M = M.at[ts, ks].set(-1.0)
    # s-rows
    for k, cone in enumerate(ctx.cones):
        start, dimk = ctx.cone_idxs[k]
        H = cone.hess(iter_aux["s_scals"][k], iter_aux["auxes"][k])
        r0 = ss + start
        eye = jnp.eye(dimk, dtype=ctx.dtype)
        if cone.use_dual:
            # mu*H_k*z_k + s_k
            M = M.at[r0:r0 + dimk, zs + start:zs + start + dimk].set(H)
            M = M.at[r0:r0 + dimk, ss + start:ss + start + dimk].set(eye)
        else:
            # z_k + mu*H_k*s_k
            M = M.at[r0:r0 + dimk, zs + start:zs + start + dimk].set(eye)
            M = M.at[r0:r0 + dimk, ss + start:ss + start + dimk].set(H)
    # kap-row: mu/tau^2 * tau + kap
    tau = iter_aux["tau"]
    M = M.at[ks, ts].set(iter_aux["mu"] / tau / tau)
    M = M.at[ks, ks].set(1.0)
    return M


def _naiveelim_lhs4(ctx, data, iter_aux):
    """4x4 system in (x, y, z, tau) after eliminating s and kap
    (`naiveelim.jl:1-33`, use_inv_hess=false H-form)."""
    n, p, q = ctx.n, ctx.p, ctx.q
    A, G, c, b, h = data["A"], data["G"], data["c"], data["b"], data["h"]
    dim = n + p + q + 1
    xs, ys, zs, ts = 0, n, n + p, n + p + q
    M = jnp.zeros((dim, dim), dtype=ctx.dtype)
    M = M.at[xs:ys, ys:zs].set(A.T)
    M = M.at[xs:ys, zs:ts].set(G.T)
    M = M.at[xs:ys, ts].set(c)
    M = M.at[ys:zs, xs:ys].set(-A)
    M = M.at[ys:zs, ts].set(b)
    for k, cone in enumerate(ctx.cones):
        start, dimk = ctx.cone_idxs[k]
        Gk = G[start:start + dimk, :]
        hk = h[start:start + dimk]
        r0 = zs + start
        eye = jnp.eye(dimk, dtype=ctx.dtype)
        s_scal = iter_aux["s_scals"][k]
        aux = iter_aux["auxes"][k]
        if cone.use_dual:
            # -G_k x + mu H_k z_k + h_k tau
            H = cone.hess(s_scal, aux)
            M = M.at[r0:r0 + dimk, xs:ys].set(-Gk)
            M = M.at[r0:r0 + dimk, zs + start:zs + start + dimk].set(H)
            M = M.at[r0:r0 + dimk, ts].set(hk)
        elif ctx.naiveelim_inv_hess:
            # -G_k x + (mu H_k)^-1 z_k + h_k tau (`naiveelim.jl:11-13`,
            # use_inv_hess=true, the reference default)
            Hi = cone.inv_hess(s_scal, aux)
            M = M.at[r0:r0 + dimk, xs:ys].set(-Gk)
            M = M.at[r0:r0 + dimk, zs + start:zs + start + dimk].set(Hi)
            M = M.at[r0:r0 + dimk, ts].set(hk)
        else:
            # -mu H_k G_k x + z_k + mu H_k h_k tau (use_inv_hess=false)
            H = cone.hess(s_scal, aux)
            M = M.at[r0:r0 + dimk, xs:ys].set(-H @ Gk)
            M = M.at[r0:r0 + dimk, zs + start:zs + start + dimk].set(eye)
            M = M.at[r0:r0 + dimk, ts].set(H @ hk)
    tau = iter_aux["tau"]
    M = M.at[ts, xs:ys].set(-c)
    M = M.at[ts, ys:zs].set(-b)
    M = M.at[ts, zs:ts].set(-h)
    M = M.at[ts, ts].set(iter_aux["mu"] / tau / tau)
    return M


# ---------------------------------------------------------------------------
# 3x3 solve
# ---------------------------------------------------------------------------


def solve_subsystem3(ctx, data, iter_aux, sys, rx, ry, rz,
                     accurate=False):
    """Solve the reduced 3x3 system; rhs already transformed per-strategy.

    qrchol: `qrchol.jl:39-85`.  symindef: dense QR solve of the assembled
    symmetric-indefinite matrix.
    Returns (x, y, z).
    """
    if ctx.syssolver == "symindef":
        rhs = jnp.concatenate([rx, ry, rz])
        sol = sys["lhs_inv"] @ rhs
        x = sol[:ctx.n]
        y = sol[ctx.n:ctx.n + ctx.p]
        z = sol[ctx.n + ctx.p:]
        return x, y, z

    if ctx.syssolver == "symindef_indirect":
        # matrix-free 3x3 solve via GMRES with per-cone product oracles
        # (`symindef.jl:282-343` uses MINRES; GMRES is the jax-native
        # equivalent for symmetric indefinite operators)
        A, G = data["A"], data["G"]
        n, p = ctx.n, ctx.p

        def matvec(v):
            vx, vy, vz = v[:n], v[n:n + p], v[n + p:]
            ox = G.T @ vz + (A.T @ vy if p else 0.0)
            oy = A @ vx if p else jnp.zeros(0, dtype=ctx.dtype)
            Hz = jnp.zeros(ctx.q, dtype=ctx.dtype)
            for k, cone in enumerate(ctx.cones):
                start, dim = ctx.cone_idxs[k]
                s_scal = iter_aux["s_scals"][k]
                aux = iter_aux["auxes"][k]
                vz_k = vz[start:start + dim]
                prod = (cone.hess_prod(s_scal, vz_k, aux) if cone.use_dual
                        else cone.inv_hess_prod(s_scal, vz_k, aux))
                Hz = Hz.at[start:start + dim].set(prod)
            oz = G @ vx - Hz
            return jnp.concatenate([ox, oy, oz])

        rhs = jnp.concatenate([rx, ry, rz])
        restart = min(rhs.shape[0], 80)

        def one_cycle(x0):
            sol, _ = jax.scipy.sparse.linalg.gmres(
                matvec, rhs, x0=x0, tol=1e-12, atol=0.0, maxiter=40,
                restart=restart, solve_method="batched")
            return sol

        def rel_res(sol):
            return (jnp.linalg.norm(matvec(sol) - rhs)
                    / jnp.maximum(jnp.linalg.norm(rhs), 1e-300))

        # convergence accounting (`symindef.jl:332-343` relies on minres's
        # internal stopping; jax's gmres returns no residual info, so
        # measure it and keep restarting while the direction would be
        # garbage): up to 3 extra warm-started cycles, each a no-op once
        # the relative residual is below sqrt(eps). A still-unconverged
        # solve degrades gracefully — the true 6x6 residual lands in
        # worst_dir_res via get_directions and refinement rolls back.
        tol_ind = jnp.sqrt(jnp.finfo(ctx.dtype).eps)
        sol0 = one_cycle(jnp.zeros_like(rhs))

        def cond(carry):
            sol, it = carry
            return (it < 3) & (rel_res(sol) > tol_ind)

        def body(carry):
            sol, it = carry
            return one_cycle(sol), it + 1

        sol, _ = jax.lax.while_loop(cond, body, (sol0, jnp.asarray(0)))
        return sol[:n], sol[n:n + p], sol[n + p:]

    assert ctx.syssolver == "qrchol"
    G = data["G"]
    p = ctx.p
    Qb = rx + G.T @ rz
    if p > 0:
        Qb = data["Ap_Q"].T @ Qb
        # y block: R'^-1 ry goes into the first p coords of the Q-basis x
        yq = data["Ap_Rinv"].T @ ry
        GQ1y = data["GQ1"] @ yq
        HGQ1y = blockwise(
            ctx, iter_aux, GQ1y,
            lambda k, v: block_hess_prod(ctx, iter_aux, k, v))
        Q2div = Qb[p:] - data["GQ2"].T @ HGQ1y
    else:
        Q2div = Qb
    if accurate and "schur_chol" in sys:
        if ctx.schur_acc_solve == "inv_corr":
            # all-MXU correction solve: explicit-inverse matvec + 2
            # Richardson corrections through the STORED Schur matrix —
            # forward error ~cond(S)*eps^?; measured equal to the
            # triangular-solve path at n=1024 while replacing two
            # sequential latency-bound trisolves with 5 matvecs
            # (benchmarks/getdir_r4.py)
            S, Si = sys["schur_lhs"], sys["schur_inv"]
            x2 = Si @ Q2div
            x2 = x2 + Si @ (Q2div - S @ x2)
            x2 = x2 + Si @ (Q2div - S @ x2)
        else:
            # refinement corrections: solve through the Cholesky factor
            # (two triangular solves) — the explicit inverse's forward
            # error ~cond(S)*eps stalls refinement at ~1e-5 residuals
            # near convergence on degenerate instances (cond(S) ~ 1/mu^2)
            x2 = linalg.cho_solve(sys["schur_chol"], Q2div[:, None])[:, 0]
    else:
        x2 = sys["schur_inv"] @ Q2div
    if p > 0:
        xq = jnp.concatenate([yq, x2])
        x = data["Ap_Q"] @ xq
    else:
        x = x2
    Gx = G @ x
    HGx = blockwise(ctx, iter_aux, Gx,
                    lambda k, v: block_hess_prod(ctx, iter_aux, k, v))
    z = HGx - rz
    if p > 0:
        y = data["Ap_Rinv"] @ (Qb[:p] - data["GQ1"].T @ HGx)
    else:
        y = jnp.zeros(0, dtype=ctx.dtype)
    return x, y, z


# ---------------------------------------------------------------------------
# full 6-dim solve with lifts
# ---------------------------------------------------------------------------


def solve_system(ctx, data, iter_aux, sys, rhs, accurate=False):
    """Solve the 6x6 system for a direction (`common.jl:129-182`)."""
    if ctx.syssolver == "naive":
        r6 = point_vec(rhs)
        sol = sys["lhs_inv"] @ r6
        n, p, q = ctx.n, ctx.p, ctx.q
        ts = n + p + q
        return {"x": sol[:n], "y": sol[n:n + p], "z": sol[n + p:ts],
                "tau": sol[ts], "s": sol[ts + 1:ts + 1 + q],
                "kap": sol[ts + 1 + q]}

    if ctx.syssolver == "naiveelim":
        # rhs4 (`naiveelim.jl:35-100` semantics, H-form)
        rz4 = jnp.zeros(ctx.q, dtype=ctx.dtype)
        for k, cone in enumerate(ctx.cones):
            start, dim = ctx.cone_idxs[k]
            rz_k = rhs["z"][start:start + dim]
            rs_k = rhs["s"][start:start + dim]
            s_scal = iter_aux["s_scals"][k]
            aux = iter_aux["auxes"][k]
            if cone.use_dual:
                val = rz_k + rs_k
            elif ctx.naiveelim_inv_hess:
                # zrhs_k + (mu H_k)^-1 srhs_k (`naiveelim.jl:54-58`)
                val = rz_k + cone.inv_hess_prod(s_scal, rs_k, aux)
            else:
                val = cone.hess_prod(s_scal, rz_k, aux) + rs_k
            rz4 = rz4.at[start:start + dim].set(val)
        r4 = jnp.concatenate([rhs["x"], rhs["y"], rz4,
                              (rhs["tau"] + rhs["kap"])[None]])
        sol4 = sys["lhs_inv"] @ r4
        n, p, q = ctx.n, ctx.p, ctx.q
        x, y, z = sol4[:n], sol4[n:n + p], sol4[n + p:n + p + q]
        sol_tau = sol4[n + p + q]
        tau_bar = iter_aux["tau"]
        s = data["h"] * sol_tau - rhs["z"] - data["G"] @ x
        kap = -iter_aux["mu"] / tau_bar / tau_bar * sol_tau + rhs["kap"]
        return {"x": x, "y": y, "z": z, "s": s, "tau": sol_tau, "kap": kap}

    # setup 3x3 rhs (setup_rhs3; strategy-dependent z transform)
    rx = rhs["x"]
    ry = -rhs["y"]
    rz3 = jnp.zeros(ctx.q, dtype=ctx.dtype)
    for k, cone in enumerate(ctx.cones):
        start, dim = ctx.cone_idxs[k]
        rz_k = rhs["z"][start:start + dim]
        rs_k = rhs["s"][start:start + dim]
        s_scal = iter_aux["s_scals"][k]
        aux = iter_aux["auxes"][k]
        if ctx.syssolver == "qrchol":
            # `qrchol.jl:16-36`
            if cone.use_dual:
                val = cone.inv_hess_prod(s_scal, -rz_k - rs_k, aux)
            else:
                val = -cone.hess_prod(s_scal, rz_k, aux) - rs_k
        else:
            # `symindef.jl:34-57` (direct and indirect)
            if cone.use_dual:
                val = -rz_k - rs_k
            else:
                val = -cone.inv_hess_prod(s_scal, rs_k, aux) - rz_k
        rz3 = rz3.at[start:start + dim].set(val)

    x_sub, y_sub, z_sub = solve_subsystem3(ctx, data, iter_aux, sys,
                                            rx, ry, rz3, accurate=accurate)

    # lift tau via the two-RHS trick (`common.jl:154-182`)
    xc, yc, zc = sys["sol_const"]
    c, b, h = data["c"], data["b"], data["h"]
    dot_obj = lambda x, y, z: (jnp.dot(c, x) + jnp.dot(b, y) + jnp.dot(h, z))
    tau_bar = iter_aux["tau"]
    tau_num = rhs["tau"] + rhs["kap"] + dot_obj(x_sub, y_sub, z_sub)
    tau_denom = iter_aux["mu"] / tau_bar / tau_bar - dot_obj(xc, yc, zc)
    sol_tau = tau_num / tau_denom

    x = x_sub + sol_tau * xc
    y = y_sub + sol_tau * yc
    z = z_sub + sol_tau * zc

    # lift s and kap (`common.jl:142-148`)
    s = h * sol_tau - rhs["z"] - data["G"] @ x
    kap = -iter_aux["mu"] / tau_bar / tau_bar * sol_tau + rhs["kap"]

    return {"x": x, "y": y, "z": z, "s": s, "tau": sol_tau, "kap": kap}


# ---------------------------------------------------------------------------
# direction computation with iterative refinement
# ---------------------------------------------------------------------------


def get_directions(ctx, data, iter_aux, sys, rhs, res_norm_cutoff,
                   min_impr_tol=0.5):
    """Solve for a direction with up to max_ref_steps refinement solves
    (`systemsolvers/common.jl:15-76`). Returns (dir, res_norm)."""
    direc = solve_system(ctx, data, iter_aux, sys, rhs)
    if ctx.max_ref_steps == 0:
        return direc, jnp.zeros((), dtype=ctx.dtype)

    def residual(d):
        res = apply_lhs(ctx, data, iter_aux, d)
        return jax.tree_util.tree_map(lambda r, t: r - t, res, rhs)

    res = residual(direc)
    res_norm = jnp.max(jnp.abs(point_vec(res)))

    def cond(carry):
        best, res, res_norm, prev_norm, prev_slow, i, active = carry
        return active & (i < ctx.max_ref_steps) & (res_norm > res_norm_cutoff)

    def body(carry):
        best, res, res_norm, prev_norm, prev_slow, i, active = carry
        corr = solve_system(ctx, data, iter_aux, sys, res, accurate=True)
        cand = jax.tree_util.tree_map(lambda bb, cc: bb - cc, best, corr)
        res_new = residual(cand)
        res_norm_new = jnp.max(jnp.abs(point_vec(res_new)))
        improved = res_norm_new < res_norm
        # on no improvement: keep best, stop
        best2 = jax.tree_util.tree_map(
            lambda cc, bb: jnp.where(improved, cc, bb), cand, best)
        res2 = jax.tree_util.tree_map(
            lambda rn, rr: jnp.where(improved, rn, rr), res_new, res)
        res_norm2 = jnp.where(improved, res_norm_new, res_norm)
        curr_slow = res_norm2 > min_impr_tol * prev_norm
        # stop if not improved, or below cutoff, or two consecutive slow
        stop = (~improved) | (res_norm2 < res_norm_cutoff) | (prev_slow & curr_slow)
        return (best2, res2, res_norm2, res_norm2, curr_slow, i + 1, ~stop)

    carry = (direc, res, res_norm, res_norm, jnp.asarray(False),
             jnp.asarray(0), res_norm > res_norm_cutoff)
    best, _, res_norm, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return best, res_norm
