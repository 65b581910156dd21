"""Functional cone-oracle protocol.

A cone instance is a *static* Python object (hashable problem structure); all
oracles are pure functions of device arrays, suitable for jit/vmap.  This
replaces the reference's mutable-cache OOP design (`src/Cones/Cones.jl:27-310`,
lazy `feas_updated`/`grad_updated`/... flags) with an explicit per-point
auxiliary pytree: ``aux = cone.point_aux(s)`` is computed once per point and
threaded into the oracles, and XLA CSE removes any remaining duplication
inside a jitted step.

Default oracle implementations are derived from the barrier function by
automatic differentiation — the TPU-native analog of the reference's
ForwardDiff-validated oracles (`test/cone.jl:117-150` uses AD as the gold
standard; here AD *is* the default implementation, with closed forms layered
on top for performance):

- ``grad = ∇F``                    via ``jax.grad``
- ``hess_prod = ∇²F · v``          via jvp-of-grad (no materialization)
- ``inv_hess_prod``                via materialized ∇²F + Cholesky
- ``dder3(d) = -½ ∇³F[d,d]``       via jvp-of-hvp

dder3 convention check (LHSCB with parameter ν): ``dder3(s) = -∇F(s)`` and
``⟨dder3(d), s⟩ = dᵀ ∇²F(s) d`` — the identities asserted by the reference
test suite (`test/cone.jl:105-111`).

Conventions for the solver layer (matches `src/Solvers/search.jl:118-133`):
oracles are evaluated at the √μ-scaled primal point ``s/√μ``, so that
``H(s/√μ) = μ·H(s)`` provides the μ-scaling of the 6×6 KKT system implicitly.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.ops import linalg


class Cone:
    """Base cone. Subclasses define `dim`, `nu`, `barrier`, `feas`,
    `init_point` and optionally closed-form oracle overrides."""

    #: True if this cone's barrier is for the dual cone (oracles are then
    #: applied to the z view instead of the s view; `src/Cones/Cones.jl:138`).
    use_dual: bool = False

    #: whether the third-order oracle is available (`use_dder3`)
    has_dder3: bool = True

    #: whether sqrt_hess_prod / inv_sqrt_hess_prod are implemented
    has_sqrt_oracles: bool = False

    def __init__(self, dim: int, use_dual: bool = False):
        self.dim = int(dim)
        self.use_dual = bool(use_dual)

    # -- static structure --------------------------------------------------

    @property
    def nu(self):
        raise NotImplementedError

    def init_point(self) -> np.ndarray:
        """Initial interior point on/near the central ray."""
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}(dim={self.dim}" + (
            ", use_dual=True)" if self.use_dual else ")"
        )

    def params_key(self):
        """Hashable key of extra cone parameters (override in cones with
        data parameters, hashing their VALUES: parameters are closed over as
        constants in compiled programs, so structural jit-cache reuse is
        only sound when parameter values match)."""
        return ()

    def struct_key(self):
        return (type(self).__name__, self.dim, self.use_dual,
                self.params_key())

    # -- core oracle: the barrier itself -----------------------------------

    def barrier(self, s):
        """Logarithmically homogeneous self-concordant barrier F(s)."""
        raise NotImplementedError

    def feas(self, s):
        """Strict feasibility of s for the (barrier) cone interior."""
        raise NotImplementedError

    def dual_feas(self, z):
        """False only if z is certainly outside the dual-cone interior.

        Default true, like `src/Cones/Cones.jl:63`.
        """
        return jnp.asarray(True)

    # -- per-point auxiliary state -----------------------------------------

    def point_aux(self, s):
        """Pure function of the (scaled) primal point computed once per point.

        Default materializes the Hessian and its shifted-Cholesky factor,
        which the default `inv_hess_prod`/`sqrt` oracles consume — the
        functional analog of `update_hess_fact` (`src/Cones/Cones.jl:239-251`).
        Subclasses with closed-form inverse Hessians override this to return
        cheaper state (or an empty dict).
        """
        H = self.hess(s, aux=None)
        L, ok = linalg.cholesky_shifted(H)
        return {"hess": H, "hess_chol": L, "hess_chol_ok": ok,
                "hess_inv": linalg.chol_inverse(L)}

    # -- first/second/third order oracles ----------------------------------

    def grad(self, s, aux=None):
        return jax.grad(self.barrier)(s)

    def hess_prod(self, s, arr, aux=None):
        """∇²F(s) @ arr for arr of shape (dim,) or (dim, m)."""
        if arr.ndim == 1:
            return jax.jvp(jax.grad(self.barrier), (s,), (arr,))[1]
        hvp = lambda v: jax.jvp(jax.grad(self.barrier), (s,), (v,))[1]
        return jax.vmap(hvp, in_axes=1, out_axes=1)(arr)

    def hess(self, s, aux=None):
        if aux is not None and "hess" in aux:
            return aux["hess"]
        return jax.jacfwd(jax.grad(self.barrier))(s)

    def inv_hess_prod(self, s, arr, aux=None):
        if aux is None or "hess_chol" not in aux:
            aux = self.point_aux(s)
        if "hess_inv" in aux:
            return aux["hess_inv"] @ arr
        L = aux["hess_chol"]
        if arr.ndim == 1:
            return linalg.cho_solve(L, arr[:, None])[:, 0]
        return linalg.cho_solve(L, arr)

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def sqrt_hess_prod(self, s, arr, aux=None):
        """Uᵀ... reference uses U from H = UᵀU (upper Cholesky): prod = U @ arr
        (`src/Cones/Cones.jl:189-206`). With lower L (H = L Lᵀ), U = Lᵀ."""
        if aux is None or "hess_chol" not in aux:
            aux = self.point_aux(s)
        L = aux["hess_chol"]
        a = arr[:, None] if arr.ndim == 1 else arr
        out = L.T @ a
        return out[:, 0] if arr.ndim == 1 else out

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        if aux is None or "hess_chol" not in aux:
            aux = self.point_aux(s)
        L = aux["hess_chol"]
        a = arr[:, None] if arr.ndim == 1 else arr
        out = linalg.solve_tri(L.T, a, lower=False, trans=True)
        return out[:, 0] if arr.ndim == 1 else out

    def dder3(self, s, d, aux=None):
        """-½ ∇³F(s)[d, d] (vector)."""
        hvp_at = lambda x: self.hess_prod(x, d, aux=None)
        return -0.5 * jax.jvp(hvp_at, (s,), (d,))[1]

    # -- solver-facing helpers ---------------------------------------------

    # keys that cache explicit inverses: cheap to use when directions are
    # solved repeatedly against one factorization, but each costs a WIDE
    # triangular solve to build — a sequential kernel that dominates the
    # vmapped line search on TPU. point_aux_light strips them so XLA
    # dead-code-eliminates their construction; inv_hess_prod falls back
    # to cho_solve on the retained factor.
    _INVERSE_CACHE_KEYS = ("Mw_inv", "hess_inv")

    def point_aux_light(self, s):
        """point_aux minus explicit-inverse caches (for the line search,
        where each H^-1 application is a single vector), with
        single-attempt factorizations (a shift-needing candidate is
        treated as infeasible rather than recovered)."""
        with linalg.chol_tries(1):
            aux = self.point_aux(s)
        if isinstance(aux, dict):
            return {k: v for k, v in aux.items()
                    if k not in self._INVERSE_CACHE_KEYS}
        return aux

    def get_proxsqr(self, s, z, irtmu, aux=None, use_max_prox=True):
        """Squared proximity ‖z·irtmu + g‖²_{H⁻¹} at scaled point s
        (`src/Cones/Cones.jl:294-310`). s is the √μ-scaled primal point."""
        g = self.grad(s, aux)
        psi = irtmu * z + g
        Hipsi = self.inv_hess_prod(s, psi, aux)
        prox = jnp.dot(Hipsi, psi)
        negtol = jnp.sqrt(jnp.finfo(s.dtype).eps)
        bad = prox < -negtol * self.dim
        return jnp.where(bad, jnp.inf, jnp.abs(prox))

    def sz_parts(self, primal, dual):
        """Per-primitive-cone <primal, dual> values as a 1-D array (one
        entry for a plain cone; BatchedCone returns one per sub-cone) —
        used by the line search's per-cone proximity windows
        (`search.jl:101-107`)."""
        return jnp.dot(primal, dual)[None]

    def nu_parts(self):
        """Per-primitive-cone barrier parameters, aligned with sz_parts."""
        return np.asarray([self.nu], dtype=np.float64)

    def adj_gated_val(self, s_scal, prim_dir, irtrtmu, centering, aux=None):
        """Third-order adjustment s-RHS block with the per-cone dder3
        identity gate (`steppers/common.jl:26-59` predadj, `:85-118`
        centadj): returns dder3 (centering) or H dir + dder3 (prediction),
        zeroed when the identity check fails."""
        rteps = jnp.sqrt(jnp.finfo(s_scal.dtype).eps)
        prim_scal = irtrtmu * prim_dir
        dder3_k = self.dder3(s_scal, prim_scal, aux)
        dot1 = jnp.dot(dder3_k, s_scal)
        if centering:
            H_prim_scal = self.hess_prod(s_scal, prim_scal, aux)
            dot2 = jnp.dot(prim_scal, H_prim_scal)
            val = dder3_k
        else:
            H_prim_dir = self.hess_prod(s_scal, prim_dir, aux)
            dot2 = irtrtmu * jnp.dot(prim_scal, H_prim_dir)
            val = H_prim_dir + dder3_k
        viol = jnp.abs(dot1 - dot2) / (rteps + jnp.abs(dot2))
        return jnp.where(viol < 1e-4, val, jnp.zeros_like(val))

    def check_numerics(self, s, z, aux=None):
        """LHSCB identity guards ⟨g,s⟩=-ν and ⟨H⁻¹g,g⟩=ν
        (`src/Cones/Cones.jl:273-290`)."""
        dt = s.dtype
        eps = jnp.finfo(dt).eps
        gtol = jnp.sqrt(jnp.sqrt(eps))
        Htol = 10 * jnp.sqrt(gtol)
        g = self.grad(s, aux)
        nu = self.nu
        ok1 = jnp.abs(1 + jnp.dot(g, s) / nu) <= gtol * self.dim
        Hig = self.inv_hess_prod(s, g, aux)
        ok2 = jnp.abs(1 - jnp.dot(Hig, g) / nu) <= Htol * self.dim
        return ok1 & ok2
