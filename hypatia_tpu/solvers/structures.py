"""Functional solver data structures.

The iterate is a flat dict-of-arrays point {x, y, z, s, tau, kap} (the
TPU-native analog of the reference's flat vector + SubArray views,
`src/Solvers/point.jl:5-54`); per-cone views are static slices, and the
primal/dual view swap for dual-barrier cones follows `point.jl:48-51`.

`StepContext` is the static (hashable) problem structure closed over by the
jitted step functions: cone specs, slices, dims, and all solver options.
"""

from dataclasses import dataclass, field
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# default backtracking alpha schedule (`src/Solvers/search.jl:41-43`)
DEFAULT_ALPHA_SCHED = (
    0.9999, 0.999, 0.99, 0.97, 0.95, 0.9, 0.85, 0.8, 0.7, 0.6, 0.5,
    0.3, 0.1, 0.05, 0.01, 0.005, 0.001, 0.0005,
)


@dataclass(frozen=True)
class StepContext:
    cones: Tuple[Any, ...]
    cone_idxs: Tuple[Tuple[int, int], ...]  # (start, dim) per cone
    n: int
    p: int
    q: int
    nu: float
    dtype: Any
    syssolver: str = "qrchol"  # qrchol | symindef | naive
    stepper: str = "combined"  # combined | predorcent
    use_adjustment: bool = True
    use_curve_search: bool = True
    max_cent_steps: int = 4
    pred_prox_bound: float = 0.0332
    shift_sched: int = 0
    min_prox: float = 0.01
    prox_bound: float = 0.99
    use_max_prox: bool = True
    alpha_sched: Tuple[float, ...] = DEFAULT_ALPHA_SCHED
    max_ref_steps: int = 5
    #: assemble sqrt-oracle cones' Schur rows in syrk form (U GQ2)'(U GQ2)
    #: — reference default when sqrt oracles exist (`qrchol.jl:219-237`)
    schur_syrk: bool = True
    #: naiveelim: use the (mu H)^-1 z-row form (`naiveelim.jl` use_inv_hess,
    #: the reference default) instead of the H-form
    naiveelim_inv_hess: bool = True
    #: qrchol refinement-correction solve: "chol" = two triangular solves
    #: through the Schur factor (XLA native, sequential/latency-bound on
    #: TPU); "inv_corr" = explicit-inverse matvec + 2 Richardson
    #: corrections through the stored Schur matrix (all-MXU; equal
    #: backward accuracy in the measured regime — benchmarks/getdir_r4.py)
    schur_acc_solve: str = "chol"
    #: mesh axis name for row-sharding the cone (q) axis of the Schur
    #: assembly in update_lhs (None = unsharded); mesh_key makes distinct
    #: meshes distinct jit cache entries
    shard_axis: Any = None
    mesh_key: Tuple = ()

    def _key(self):
        return (
            tuple(c.struct_key() for c in self.cones), self.cone_idxs,
            self.n, self.p, self.q, str(self.dtype), self.syssolver,
            self.stepper, self.use_adjustment, self.use_curve_search,
            self.max_cent_steps, self.pred_prox_bound, self.shift_sched,
            self.min_prox, self.prox_bound, self.use_max_prox,
            self.alpha_sched, self.max_ref_steps, self.schur_syrk,
            self.naiveelim_inv_hess, self.schur_acc_solve,
            self.shard_axis, self.mesh_key,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, StepContext)
                and self._key() == other._key()
                and all(type(a) is type(b)
                        for a, b in zip(self.cones, other.cones)))


# ---------------------------------------------------------------------------
# point helpers
# ---------------------------------------------------------------------------


def zero_point(ctx):
    zf = lambda d: jnp.zeros(d, dtype=ctx.dtype)
    sc = jnp.zeros((), dtype=ctx.dtype)
    return {"x": zf(ctx.n), "y": zf(ctx.p), "z": zf(ctx.q), "s": zf(ctx.q),
            "tau": sc, "kap": sc}


def point_vec(pt):
    """Flatten a point dict to one vector (x, y, z, tau, s, kap order as in
    `point.jl:30-44`)."""
    return jnp.concatenate([
        pt["x"], pt["y"], pt["z"], pt["tau"][None], pt["s"], pt["kap"][None]
    ])


def point_axpy(a, px, py):
    """py + a * px elementwise over point dicts."""
    return jax.tree_util.tree_map(lambda u, v: v + a * u, px, py)


def point_scale(a, pt):
    return jax.tree_util.tree_map(lambda u: a * u, pt)


def point_sub(pa, pb):
    return jax.tree_util.tree_map(lambda u, v: u - v, pa, pb)


def point_inf_norm(pt):
    return jnp.max(jnp.abs(point_vec(pt)))


def cone_view(ctx, vec, k):
    start, dim = ctx.cone_idxs[k]
    return vec[start:start + dim]


def primal_dual_views(ctx, z, s, k):
    """(primal_k, dual_k) respecting the dual-barrier swap."""
    zk = cone_view(ctx, z, k)
    sk = cone_view(ctx, s, k)
    if ctx.cones[k].use_dual:
        return zk, sk
    return sk, zk


def scatter_cone(ctx, vec, k, val):
    start, dim = ctx.cone_idxs[k]
    return vec.at[start:start + dim].set(val)


# ---------------------------------------------------------------------------
# per-iterate cone state: scaled primal points, per-point aux, grads
# ---------------------------------------------------------------------------


def calc_mu(ctx, pt):
    """mu = (z's + tau*kap)/(nu+1)  (`Solvers.jl:418-423`)."""
    return (jnp.dot(pt["z"], pt["s"]) + pt["tau"] * pt["kap"]) / (ctx.nu + 1)


def compute_iter_aux(ctx, pt):
    """Per-iterate cached cone state at the sqrt(mu)-scaled primal point.

    Functional replacement for the reference's load_point(…, irtmu) +
    lazy-cache pattern (`search.jl:118-120`, `Cones.jl:185`).
    """
    mu = calc_mu(ctx, pt)
    irtmu = 1.0 / jnp.sqrt(mu)
    s_scals, auxes, grads, duals = [], [], [], []
    for k, cone in enumerate(ctx.cones):
        primal_k, dual_k = primal_dual_views(ctx, pt["z"], pt["s"], k)
        s_scal = irtmu * primal_k
        aux = cone.point_aux(s_scal)
        s_scals.append(s_scal)
        auxes.append(aux)
        grads.append(cone.grad(s_scal, aux))
        duals.append(dual_k)
    return {
        "mu": mu,
        "irtmu": irtmu,
        "tau": pt["tau"],
        "kap": pt["kap"],
        "s_scals": s_scals,
        "auxes": auxes,
        "grads": grads,
        "duals": duals,
    }


def block_hess_prod(ctx, iter_aux, k, arr):
    """H̄_k @ arr: Hessian for primal-barrier cones, inverse Hessian for
    dual-barrier cones (`qrchol.jl:87-100` block_hess_prod!)."""
    cone = ctx.cones[k]
    s_scal = iter_aux["s_scals"][k]
    aux = iter_aux["auxes"][k]
    if cone.use_dual:
        return cone.inv_hess_prod(s_scal, arr, aux)
    return cone.hess_prod(s_scal, arr, aux)


def block_sqrt_hess_prod(ctx, iter_aux, k, arr):
    """Ū_k @ arr with H̄_k = Ū_k' Ū_k: sqrt-Hessian for primal-barrier
    cones, inverse-sqrt for dual-barrier cones (`qrchol.jl:219-237` uses
    these for the syrk-form Schur assembly)."""
    cone = ctx.cones[k]
    s_scal = iter_aux["s_scals"][k]
    aux = iter_aux["auxes"][k]
    if cone.use_dual:
        return cone.inv_sqrt_hess_prod(s_scal, arr, aux)
    return cone.sqrt_hess_prod(s_scal, arr, aux)


def blockwise(ctx, iter_aux, vec, fn):
    """Apply a per-cone fn (k, slice) -> slice over the q-dim vector."""
    out = jnp.zeros_like(vec)
    for k in range(len(ctx.cones)):
        start, dim = ctx.cone_idxs[k]
        out = out.at[start:start + dim].set(fn(k, vec[start:start + dim]))
    return out
