"""Interior-point solver driver.

Orchestration mirrors `src/Solvers/Solvers.jl:245-416`: host-side
preprocessing + initial point (once), then an iteration loop where each
step is a single jitted on-device program (KKT factor, four direction solves
with iterative refinement, batched curve search).  Convergence bookkeeping
(status decisions, slow-progress detection, limits) runs on host from the
scalar diagnostics each step returns — the device does all the linear
algebra, the host only branches on ~10 floats per iteration.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import hypatia_tpu.config  # noqa: F401  (enables x64)
from hypatia_tpu.utils.dtypes import default_tols, eps as dtype_eps
from hypatia_tpu.solvers import process, steppers
from hypatia_tpu.solvers.structures import StepContext, calc_mu
from hypatia_tpu.models.model import Model

# solver termination statuses (`Solvers.jl:34-49`)
STATUSES = (
    "NotLoaded", "Loaded", "SolveCalled", "Optimal", "PrimalInfeasible",
    "DualInfeasible", "IllPosed", "PrimalInconsistent", "DualInconsistent",
    "SlowProgress", "IterationLimit", "TimeLimit", "NumericalFailure",
    "NearOptimal", "UnknownStatus",
)


def calc_convergence(ctx, data, conv_tols, pt):
    """Residuals of the four HSDE equations + convergence parameters
    (`Solvers.jl:425-483`). Returns dict of device arrays/scalars."""
    A, G, c, b, h = data["A"], data["G"], data["c"], data["b"], data["h"]
    x, y, z, s = pt["x"], pt["y"], pt["z"], pt["s"]
    tau, kap = pt["tau"], pt["kap"]

    AtGt = G.T @ z + (A.T @ y if ctx.p else 0.0)
    x_norm_res_t = jnp.max(jnp.abs(AtGt)) if ctx.n else jnp.zeros((), ctx.dtype)
    x_res = AtGt + c * tau
    x_norm_res = (jnp.max(jnp.abs(x_res)) if ctx.n else jnp.zeros((), ctx.dtype)) / tau
    x_residual = -x_res

    if ctx.p:
        Ax = A @ x
        y_norm_res_t = jnp.max(jnp.abs(Ax))
        y_res = Ax - b * tau
        y_norm_res = jnp.max(jnp.abs(y_res)) / tau
    else:
        y_res = jnp.zeros(0, dtype=ctx.dtype)
        y_norm_res_t = jnp.zeros((), ctx.dtype)
        y_norm_res = jnp.zeros((), ctx.dtype)
    y_residual = y_res

    Gxs = G @ x + s
    z_norm_res_t = jnp.max(jnp.abs(Gxs))
    z_res = Gxs - h * tau
    z_norm_res = jnp.max(jnp.abs(z_res)) / tau
    z_residual = z_res

    primal_obj_t = jnp.dot(c, x)
    dual_obj_t = -(jnp.dot(b, y) if ctx.p else 0.0) - jnp.dot(h, z)
    tau_residual = primal_obj_t - dual_obj_t + kap

    return {
        "x": x_residual, "y": y_residual, "z": z_residual,
        "tau_residual": tau_residual,
        "x_norm_res_t": x_norm_res_t, "y_norm_res_t": y_norm_res_t,
        "z_norm_res_t": z_norm_res_t,
        "x_norm_res": x_norm_res, "y_norm_res": y_norm_res,
        "z_norm_res": z_norm_res,
        "x_feas": x_norm_res * conv_tols["x"],
        "y_feas": y_norm_res * conv_tols["y"],
        "z_feas": z_norm_res * conv_tols["z"],
        "tau_feas": jnp.abs(tau_residual),
        "primal_obj_t": primal_obj_t, "dual_obj_t": dual_obj_t,
        "gap": jnp.dot(z, s),
        "mu": calc_mu(ctx, pt),
        "tau": tau, "kap": kap,
    }


@functools.partial(jax.jit, static_argnums=(0,))
def _conv_jit(ctx, data, conv_tols, pt):
    return calc_convergence(ctx, data, conv_tols, pt)


@functools.partial(jax.jit, static_argnums=(0,))
def _step_combined_jit(ctx, data, pt, residuals, cutoff, prev_sched):
    return steppers.step_combined(ctx, data, pt, residuals, cutoff,
                                  prev_sched)


@functools.partial(jax.jit, static_argnums=(0,))
def _step_predorcent_jit(ctx, data, pt, residuals, cutoff, is_pred):
    return steppers.step_predorcent(ctx, data, pt, residuals, cutoff, is_pred)


class Solver:
    """Conic IPM solver (options mirror `Solver{T}` `Solvers.jl:162-240`).

    `fused=True` (default when not verbose) runs the whole iteration loop as
    one on-device `lax.while_loop` with zero per-iteration host sync — the
    TPU-native execution mode. `fused=False` steps once per host iteration
    (needed for verbose iteration printing and time limits).
    """

    def __init__(
        self,
        verbose=False,
        iter_limit=1000,
        time_limit=np.inf,
        tol_rel_opt=None,
        tol_abs_opt=None,
        tol_feas=None,
        tol_infeas=None,
        tol_illposed=None,
        default_tol_relax=1.0,
        tol_slow=1e-3,
        preprocess=True,
        reduce=True,
        rescale=True,
        init_tol_qr=None,
        init_use_indirect=False,
        stepper="combined",
        syssolver="qrchol",
        use_adjustment=True,
        use_curve_search=True,
        max_cent_steps=4,
        pred_prox_bound=0.0332,
        use_max_prox=True,
        prox_bound=0.99,
        min_prox=0.01,
        shift_sched=0,
        max_ref_steps=5,
        near_factor=1000.0,
        schur_syrk=True,
        naiveelim_inv_hess=True,
        schur_acc_solve=None,
        group_cones=True,
        fused=None,
        dtype=np.float64,
        mesh=None,
    ):
        self.dtype = np.dtype(dtype)
        tols = default_tols(self.dtype, default_tol_relax)
        self.verbose = verbose
        self.iter_limit = iter_limit
        self.time_limit = time_limit
        self.tol_rel_opt = tol_rel_opt if tol_rel_opt is not None else tols["tol_rel_opt"]
        self.tol_abs_opt = tol_abs_opt if tol_abs_opt is not None else tols["tol_abs_opt"]
        self.tol_feas = tol_feas if tol_feas is not None else tols["tol_feas"]
        self.tol_infeas = tol_infeas if tol_infeas is not None else tols["tol_infeas"]
        self.tol_illposed = tol_illposed if tol_illposed is not None else tols["tol_illposed"]
        self.tol_slow = tol_slow
        self.preprocess = preprocess
        self.reduce = reduce
        if syssolver == "qrchol":
            assert preprocess, "qrchol requires preprocessing"
        if reduce:
            assert preprocess, "reduce requires preprocessing"
        self.rescale = rescale
        self.init_tol_qr = (init_tol_qr if init_tol_qr is not None
                            else 1000 * dtype_eps(self.dtype))
        # indirect (LSQR) initial point: skips host QR of [A; G]
        # (`Solvers.jl` option init_use_indirect); requires
        # preprocess=False / reduce=False like the reference
        self.init_use_indirect = init_use_indirect
        if init_use_indirect:
            assert not preprocess and not reduce, \
                "init_use_indirect requires preprocess=False, reduce=False"
        self.stepper = stepper
        self.syssolver = syssolver
        self.stepper_opts = dict(
            use_adjustment=use_adjustment,
            use_curve_search=use_curve_search,
            max_cent_steps=max_cent_steps,
            pred_prox_bound=pred_prox_bound,
            use_max_prox=use_max_prox,
            prox_bound=prox_bound,
            min_prox=min_prox,
            shift_sched=shift_sched,
            schur_syrk=schur_syrk,
            naiveelim_inv_hess=naiveelim_inv_hess,
            # refinement-correction solve: on accelerators the two
            # sequential triangular solves are latency-bound (~10 ms at
            # n=1000, the dominant getdir cost at MXU scale); the all-MXU
            # inverse+2-Richardson form has equal observed accuracy
            # (conditionnum canary + full suite). CPU keeps the LAPACK
            # triangular solves (faster AND backward stable there).
            schur_acc_solve=(schur_acc_solve if schur_acc_solve is not None
                             else ("chol" if jax.default_backend() == "cpu"
                                   else "inv_corr")),
        )
        self.max_ref_steps = max_ref_steps
        #: NearOptimal relaxed termination: when the solve stalls
        #: (SlowProgress / IterationLimit / TimeLimit / NumericalFailure)
        #: but the final iterate satisfies the convergence conditions at
        #: `near_factor` x the tolerances, report NearOptimal instead of
        #: the failure status. The reference lists this as a TODO
        #: (`Solvers.jl` "NearOptimal" comments); 0/None disables.
        self.near_factor = near_factor
        self.group_cones = group_cones
        self.fused = fused
        #: jax.sharding.Mesh for a SINGLE-model distributed solve: the cone
        #: (q) axis of the Schur assembly is row-sharded over the mesh's
        #: first axis with a compiler-inserted psum (see solvers/shard.py)
        self.mesh = mesh
        if mesh is not None:
            assert syssolver == "qrchol", "sharded solve uses qrchol"

        self.status = "NotLoaded"
        self.num_iters = 0
        self.solve_time = np.nan
        self.orig_model = None
        # phase timers (`Solvers.jl:87-96`)
        self.timers = {}

    # -- loading -----------------------------------------------------------

    def load(self, model: Model):
        self.orig_model = model
        self.status = "Loaded"
        return self

    # -- result getters ----------------------------------------------------

    def get_status(self):
        return self.status

    def get_num_iters(self):
        return self.num_iters

    def get_solve_time(self):
        return self.solve_time

    def get_primal_obj(self):
        return self.primal_obj

    def get_dual_obj(self):
        return self.dual_obj

    def get_x(self):
        return self.result["x"].copy()

    def get_y(self):
        return self.result["y"].copy()

    def get_z(self):
        return self.result["z"].copy()

    def get_s(self):
        return self.result["s"].copy()

    # -- main solve --------------------------------------------------------

    def solve(self):
        from hypatia_tpu.solvers import shard as shardmod

        # keep the mesh active for every jit trace in the solve (fused loop
        # and host-mode step programs alike)
        with shardmod.mesh_scope(self.mesh):
            return self._solve_impl()

    def _solve_impl(self):
        assert self.status == "Loaded"
        self.status = "SolveCalled"
        start_time = time.time()
        self.num_iters = 0
        orig = self.orig_model
        self.result = {
            "x": np.zeros(orig.n, dtype=self.dtype),
            "y": np.zeros(orig.p, dtype=self.dtype),
            "z": np.zeros(orig.q, dtype=self.dtype),
            "s": np.zeros(orig.q, dtype=self.dtype),
        }
        self.primal_obj = np.nan
        self.dual_obj = np.nan
        timers = self.timers = {k: 0.0 for k in (
            "rescale", "initx", "inity", "unproc", "loadsys", "step")}

        model = orig.copy()
        pre = process.Preprocess()
        pre.preprocess_used = self.preprocess

        # initial cone point: s = interior point, z = -grad(s) (mu = 1)
        # (`Solvers.jl:530-548`)
        init_z = np.zeros(model.q, dtype=self.dtype)
        init_s = np.zeros(model.q, dtype=self.dtype)
        for cone, (start, dim) in zip(model.cones, model.cone_idxs):
            pt0 = np.asarray(cone.init_point(), dtype=self.dtype)
            g0 = np.asarray(cone.grad(jnp.asarray(pt0)))
            primal = init_z if cone.use_dual else init_s
            dual = init_s if cone.use_dual else init_z
            primal[start:start + dim] = pt0
            dual[start:start + dim] = -g0

        t0 = time.time()
        if self.rescale:
            process.rescale_data(model, pre)
        timers["rescale"] = time.time() - t0

        if self.reduce:
            t0 = time.time()
            process.find_initial_y(model, pre, init_z, True, self.preprocess,
                                   self.init_tol_qr, self.verbose)
            timers["inity"] = time.time() - t0
            t0 = time.time()
            if pre.status is None:
                process.find_initial_x(model, pre, init_s, self.preprocess,
                                       self.init_tol_qr, self.verbose)
            timers["initx"] = time.time() - t0
        else:
            t0 = time.time()
            process.find_initial_x(model, pre, init_s, self.preprocess,
                                   self.init_tol_qr, self.verbose,
                                   use_indirect=self.init_use_indirect)
            timers["initx"] = time.time() - t0
            t0 = time.time()
            if pre.status is None:
                process.find_initial_y(model, pre, init_z, False,
                                       self.preprocess, self.init_tol_qr,
                                       self.verbose,
                                       use_indirect=self.init_use_indirect)
            timers["inity"] = time.time() - t0

        if pre.status is not None:
            self.status = pre.status
            self.solve_time = time.time() - start_time
            return self

        self.model = model
        self.pre = pre

        # build static context + device data
        t0 = time.time()
        from hypatia_tpu.solvers import shard as shardmod

        # group adjacent structurally-identical cones into vmapped
        # BatchedCones (SURVEY §7 "group cones by type"): program size and
        # sequential per-cone work stop scaling with the cone count
        from hypatia_tpu.cones.batched import (
            group_cones as _group_cones,
            sort_perm_for_grouping as _sort_perm,
        )

        # permutation layer: reorder NON-adjacent structurally-identical
        # cones to be adjacent before grouping (G/h rows are permuted into
        # an equivalent model; z/s are un-permuted at postprocess)
        self._perm_q = None
        s_cones = list(model.cones)
        s_idxs = list(model.cone_idxs)
        if self.group_cones and len(model.cones) > 2:
            sp = _sort_perm(model.cones, model.cone_idxs)
            if sp is not None:
                order, perm_q = sp
                self._perm_q = perm_q
                s_cones = [model.cones[i] for i in order]
                starts = np.concatenate(
                    [[0], np.cumsum([c.dim for c in s_cones])[:-1]])
                s_idxs = [(int(st), c.dim)
                          for st, c in zip(starts, s_cones)]

        if self.group_cones:
            g_cones, g_idxs = _group_cones(tuple(s_cones), tuple(s_idxs))
        else:
            g_cones = tuple(s_cones)
            g_idxs = tuple(s_idxs)
        ctx = StepContext(
            cones=g_cones,
            cone_idxs=g_idxs,
            n=model.n, p=model.p, q=model.q, nu=model.nu,
            dtype=jnp.dtype(self.dtype),
            syssolver=self.syssolver,
            stepper=self.stepper,
            max_ref_steps=self.max_ref_steps,
            shard_axis=(self.mesh.axis_names[0]
                        if self.mesh is not None else None),
            mesh_key=shardmod.mesh_key(self.mesh),
            **self.stepper_opts,
        )
        self.ctx = ctx
        dt = jnp.dtype(self.dtype)
        if self._perm_q is not None:
            G_s = np.asarray(model.G)[self._perm_q]
            h_s = np.asarray(model.h)[self._perm_q]
        else:
            G_s, h_s = model.G, model.h
        data = {
            "c": jnp.asarray(model.c, dt), "A": jnp.asarray(model.A, dt),
            "b": jnp.asarray(model.b, dt), "G": jnp.asarray(G_s, dt),
            "h": jnp.asarray(h_s, dt),
        }
        if self.syssolver == "qrchol":
            if model.p > 0:
                GQ = G_s @ pre.Ap_Q
                data["Ap_Q"] = jnp.asarray(pre.Ap_Q, dt)
                data["Ap_R"] = jnp.asarray(pre.Ap_R, dt)
                # explicit R^-1 (host, once per load): turns the two
                # per-direction-solve triangular solves into MXU matmuls —
                # on TPU triangular solves are latency-bound sequential
                # kernels and serialize under vmap
                import scipy.linalg as _sla
                data["Ap_Rinv"] = jnp.asarray(
                    _sla.solve_triangular(
                        np.asarray(pre.Ap_R, dtype=np.float64),
                        np.eye(pre.Ap_R.shape[0]), lower=False), dt)
                data["GQ1"] = jnp.asarray(GQ[:, :model.p], dt)
                data["GQ2"] = jnp.asarray(GQ[:, model.p:], dt)
            else:
                data["GQ2"] = data["G"]
        if self.mesh is not None and model.q % self.mesh.devices.size == 0:
            # place the q-axis data row-sharded over the mesh; everything
            # else replicated (GSPMD partitions the step accordingly).
            # Uneven q skips the placement — update_lhs zero-pads and
            # constrains the shard there instead.
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = self.mesh.axis_names[0]
            row = NamedSharding(self.mesh, P(ax, None))
            vec = NamedSharding(self.mesh, P(ax))
            for key in ("G", "GQ2", "GQ1"):
                if key in data:
                    data[key] = jax.device_put(data[key], row)
            data["h"] = jax.device_put(data["h"], vec)
        self.data = data

        pt = {
            "x": jnp.asarray(pre.init_x, dt), "y": jnp.asarray(pre.init_y, dt),
            "z": jnp.asarray(init_z if self._perm_q is None
                             else init_z[self._perm_q], dt),
            "s": jnp.asarray(init_s if self._perm_q is None
                             else init_s[self._perm_q], dt),
            "tau": jnp.ones((), dtype=ctx.dtype),
            "kap": jnp.ones((), dtype=ctx.dtype),
        }

        mu0 = float(calc_mu(ctx, pt))
        if np.isnan(mu0) or abs(1.0 - mu0) > np.sqrt(dtype_eps(self.dtype)):
            print(f"WARNING: initial mu is {mu0} but should be 1 "
                  "(possible cone oracle problem)")

        conv_tols = {
            "x": jnp.asarray(1.0 / (1.0 + np.max(np.abs(model.c),
                                                 initial=0.0)), dt),
            "y": jnp.asarray(1.0 / (1.0 + np.max(np.abs(model.b),
                                                 initial=0.0)), dt),
            "z": jnp.asarray(1.0 / (1.0 + np.max(np.abs(model.h),
                                                 initial=0.0)), dt),
        }
        timers["loadsys"] = time.time() - t0

        use_fused = self.fused
        if use_fused is None:
            use_fused = (not self.verbose) and self.stepper == "combined" \
                and np.isinf(self.time_limit)
        if use_fused and self.stepper == "combined":
            return self._solve_fused(ctx, data, conv_tols, pt, orig, model,
                                     pre, timers, start_time)

        # iteration loop (`Solvers.jl:340-398`)
        prev_feas = dict(x=np.nan, y=np.nan, z=np.nan, tau=np.nan)
        prev_is_slow = prev2_is_slow = False
        cent_count = 0
        prox = 0.0
        self.worst_dir_res = 0.0

        if self.verbose:
            print(f"{'iter':>5} {'p_obj':>12} {'d_obj':>12} {'abs_gap':>9} "
                  f"{'x_feas':>9} {'y_feas':>9} {'z_feas':>9} {'tau':>9} "
                  f"{'kap':>9} {'mu':>9} {'dir_res':>8} {'prox':>8} "
                  f"{'step':>5} {'alpha':>9}")
        prev_alpha = 0.0
        prev_mode = -1
        prev_sched = jnp.zeros((), dtype=jnp.int32)
        mode_names = {0: "co-a", 1: "comb", 2: "ce-a", 3: "cent", 4: "pr-a"}

        while True:
            conv = _conv_jit(ctx, data, conv_tols, pt)
            convh = jax.device_get(conv)
            tau = float(convh["tau"])
            kap = float(convh["kap"])
            mu = float(convh["mu"])
            pobj_t = float(convh["primal_obj_t"])
            dobj_t = float(convh["dual_obj_t"])
            gap = float(convh["gap"])
            feas = {k: float(convh[f"{k}_feas"]) for k in ("x", "y", "z", "tau")}
            self.primal_obj = pobj_t / tau + model.obj_offset
            self.dual_obj = dobj_t / tau + model.obj_offset
            self.gap = gap

            if self.verbose:
                step_name = mode_names.get(prev_mode, "")
                print(f"{self.num_iters:5d} {self.primal_obj:12.4e} "
                      f"{self.dual_obj:12.4e} {gap:9.2e} {feas['x']:9.2e} "
                      f"{feas['y']:9.2e} {feas['z']:9.2e} {tau:9.2e} "
                      f"{kap:9.2e} {mu:9.2e} {self.worst_dir_res:8.1e} "
                      f"{prox:8.1e} {step_name:>5} {prev_alpha:9.2e}")

            # improvement metric (`Solvers.jl:460-476`)
            improv = 0.0
            for key in ("x", "y", "z", "tau"):
                prev = prev_feas[key]
                curr = feas[key]
                if not (np.isnan(prev) or np.isnan(curr)):
                    improv = max(improv, (prev - curr) / (abs(prev) + 1e-300))
            prev_feas = feas.copy()

            if self._check_convergence(tau, kap, mu, pobj_t, dobj_t, gap, feas,
                                       convh):
                break

            if self.num_iters == self.iter_limit:
                self.status = "IterationLimit"
                break
            if time.time() - start_time >= self.time_limit:
                self.status = "TimeLimit"
                break

            expect_improvement = (self.stepper == "combined") or (cent_count == 0)
            if expect_improvement:
                if improv < self.tol_slow:
                    if prev_is_slow and prev2_is_slow:
                        self.status = "SlowProgress"
                        break
                    prev2_is_slow, prev_is_slow = prev_is_slow, True
                else:
                    prev2_is_slow, prev_is_slow = prev_is_slow, False

            cutoff = 1e-4 * max(float(convh["x_norm_res"]),
                                float(convh["y_norm_res"]),
                                float(convh["z_norm_res"]), feas["tau"])
            residuals = {"x": conv["x"], "y": conv["y"], "z": conv["z"],
                         "tau": conv["tau_residual"]}

            t0 = time.time()
            if self.stepper == "combined":
                pt, info = _step_combined_jit(ctx, data, pt, residuals,
                                              cutoff, prev_sched)
                prev_sched = info["sched_idx"]
            else:
                is_pred = (cent_count >= self.stepper_opts["max_cent_steps"]
                           or prox < self.stepper_opts["pred_prox_bound"])
                cent_count = 0 if is_pred else cent_count + 1
                pt, info = _step_predorcent_jit(ctx, data, pt, residuals,
                                                cutoff, is_pred)
            infoh = jax.device_get(info)
            found = bool(infoh["found"])
            prox = float(infoh["prox"])
            prev_alpha = float(infoh["alpha"])
            prev_mode = int(infoh["mode"])
            self.worst_dir_res = max(self.worst_dir_res,
                                     float(infoh["worst_dir_res"]))
            timers["step"] += time.time() - t0

            if not found:
                self.status = "NumericalFailure"
                break

            mu_new = float(calc_mu(ctx, pt))
            tau_new = float(pt["tau"])
            kap_new = float(pt["kap"])
            if min(tau_new, kap_new, mu_new) <= 0 or np.isnan(mu_new):
                self.status = "NumericalFailure"
                break

            self.num_iters += 1

        # NearOptimal relaxed re-check on the final iterate
        if self.status in ("SlowProgress", "IterationLimit", "TimeLimit",
                           "NumericalFailure"):
            convh = jax.device_get(_conv_jit(ctx, data, conv_tols, pt))
            if self._is_near_optimal(convh):
                self.status = "NearOptimal"
                tau = float(convh["tau"])
                self.primal_obj = (float(convh["primal_obj_t"]) / tau
                                   + model.obj_offset)
                self.dual_obj = (float(convh["dual_obj_t"]) / tau
                                 + model.obj_offset)
                self.gap = float(convh["gap"])

        # finalize result
        t0 = time.time()
        point_np = {k: np.asarray(v) for k, v in pt.items()}
        point_np = self._unpermute_point(point_np)
        process.postprocess(self.status, orig, model, pre, point_np,
                            self.result)
        timers["unproc"] = time.time() - t0
        self.solve_time = time.time() - start_time
        if self.verbose:
            print(f"\nstatus is {self.status} after {self.num_iters} "
                  f"iterations and {self.solve_time:.3f} seconds\n")
        return self

    def _solve_fused(self, ctx, data, conv_tols, pt, orig, model, pre,
                     timers, start_time):
        """Fully on-device solve (`hypatia_tpu.solvers.fused`)."""
        from hypatia_tpu.solvers import fused

        tols = {
            "tol_feas": jnp.asarray(self.tol_feas, ctx.dtype),
            "tol_rel_opt": jnp.asarray(self.tol_rel_opt, ctx.dtype),
            "tol_abs_opt": jnp.asarray(self.tol_abs_opt, ctx.dtype),
            "tol_infeas": jnp.asarray(self.tol_infeas, ctx.dtype),
            "tol_illposed": jnp.asarray(self.tol_illposed, ctx.dtype),
        }
        t0 = time.time()
        pt, status_code, iters, conv, wdr = fused.fused_solve_jit(
            ctx, data, conv_tols, tols, pt, self.iter_limit,
            jnp.asarray(self.tol_slow, dtype=ctx.dtype))
        convh = jax.device_get(conv)
        timers["step"] = time.time() - t0
        self.final_point = pt  # device iterate (for the phase profiler)

        code = int(status_code)
        self.status = fused.STATUS_CODES.get(code, "UnknownStatus")
        if (self.status in ("SlowProgress", "IterationLimit",
                            "NumericalFailure")
                and self._is_near_optimal(convh)):
            self.status = "NearOptimal"
        self.num_iters = int(iters)
        self.worst_dir_res = float(wdr)
        tau = float(convh["tau"])
        self.gap = float(convh["gap"])
        if self.status in ("PrimalInfeasible", "DualInfeasible"):
            self.primal_obj = float(convh["primal_obj_t"])
            self.dual_obj = float(convh["dual_obj_t"])
        else:
            self.primal_obj = float(convh["primal_obj_t"]) / tau \
                + model.obj_offset
            self.dual_obj = float(convh["dual_obj_t"]) / tau \
                + model.obj_offset

        t0 = time.time()
        point_np = self._unpermute_point(jax.device_get(pt))
        process.postprocess(self.status, orig, model, pre, point_np,
                            self.result)
        timers["unproc"] = time.time() - t0
        self.solve_time = time.time() - start_time
        if self.verbose:
            print(f"status is {self.status} after {self.num_iters} "
                  f"iterations and {self.solve_time:.3f} seconds")
        return self

    def _unpermute_point(self, point):
        """Invert the cone-sorting row permutation on the z/s blocks
        (x, y, tau, kap are unaffected by conic row reordering)."""
        if getattr(self, "_perm_q", None) is None:
            return point
        inv = np.empty_like(self._perm_q)
        inv[self._perm_q] = np.arange(len(self._perm_q))
        point = dict(point)
        point["z"] = np.asarray(point["z"])[inv]
        point["s"] = np.asarray(point["s"])[inv]
        return point

    def _check_convergence(self, tau, kap, mu, pobj_t, dobj_t, gap, feas,
                           convh):
        """Termination tests (`Solvers.jl:485-528`)."""
        eps = dtype_eps(self.dtype)
        is_feas = max(feas["x"], feas["y"], feas["z"]) <= self.tol_feas
        is_abs_opt = gap <= self.tol_abs_opt
        is_rel_opt = (min(gap / tau, abs(pobj_t - dobj_t)) <=
                      self.tol_rel_opt * max(tau, min(abs(pobj_t), abs(dobj_t))))
        if is_feas and (is_abs_opt or is_rel_opt):
            self.status = "Optimal"
            return True
        if dobj_t > eps and float(convh["x_norm_res_t"]) <= self.tol_infeas * dobj_t:
            self.status = "PrimalInfeasible"
            self.primal_obj = pobj_t
            self.dual_obj = dobj_t
            return True
        if pobj_t < -eps and (max(float(convh["y_norm_res_t"]),
                                  float(convh["z_norm_res_t"]))
                              <= self.tol_infeas * -pobj_t):
            self.status = "DualInfeasible"
            self.primal_obj = pobj_t
            self.dual_obj = dobj_t
            return True
        if mu <= self.tol_illposed and tau <= self.tol_illposed * min(1.0, kap):
            self.status = "IllPosed"
            return True
        return False

    def _is_near_optimal(self, convh):
        """Optimality test at near_factor x tolerances on the final iterate
        (relaxed termination; the reference carries this as a TODO)."""
        nf = self.near_factor
        if not nf:
            return False
        tau = float(convh["tau"])
        if not np.isfinite(tau) or tau <= 0:
            return False
        gap = float(convh["gap"])
        pobj_t = float(convh["primal_obj_t"])
        dobj_t = float(convh["dual_obj_t"])
        feas = max(float(convh["x_feas"]), float(convh["y_feas"]),
                   float(convh["z_feas"]))
        if not np.isfinite(feas) or not np.isfinite(gap):
            return False
        is_feas = feas <= nf * self.tol_feas
        is_abs = gap <= nf * self.tol_abs_opt
        is_rel = (min(gap / tau, abs(pobj_t - dobj_t)) <=
                  nf * self.tol_rel_opt
                  * max(tau, min(abs(pobj_t), abs(dobj_t))))
        return is_feas and (is_abs or is_rel)


def solve(model, **options):
    """Convenience: build a Solver, load, solve, return it."""
    solver = Solver(**options)
    solver.load(model)
    return solver.solve()
