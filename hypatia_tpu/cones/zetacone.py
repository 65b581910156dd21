"""Stable shared oracle machinery for epigraph/hypograph "zeta" cones.

Most exotic cones have barriers of the form

    F(u, wbar) = -log(zeta) + phi(wbar),   zeta = sgn*(u - xi(wbar))

with xi convex (epi, sgn=+1) or concave (hypo, sgn=-1) and phi a sum of
-log terms.  The reference implements per-cone closed-form inverse Hessians
for these (e.g. `hypoperlog.jl:111-285`, `epirelentropy.jl`); the essential
reason those closed forms are *numerically stable* near the cone boundary
(zeta -> 0, cond(H) ~ 1/zeta^2) is that the ill-conditioned rank-1 direction
v = grad(zeta)/zeta is handled analytically.

Here we capture that structure once, generically:

    H = v v' + blkdiag(0, Mw),   v = (sgn, -sgn*grad xi)/zeta,
    Mw = hess(phi) + sgn*hess(xi)/zeta    (well-conditioned, PSD)

and solve H x = r via the stable block elimination

    y   = zeta * sgn * r_u
    x_w = Mw^{ -1 } (r_w - b y)      with b = -sgn*grad(xi)/zeta... (see code)
    x_u = (y - b' x_w) / a

Only Mw is factored — the 1/zeta^2 direction never enters a factorization.
Subclasses provide `xi`, `phi`, `sgn`; everything else (including grad,
hess_prod, dder3 via autodiff — which are stable for this composition) is
inherited.  Cones with extra structure can override `Mw_solve` with O(d)
diagonal-plus-low-rank solves later for performance.
"""

import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.ops import linalg


class ZetaCone(Cone):
    """Cone with barrier -log(sgn*(u - xi(w))) + phi(w), u the coordinate at
    index 0, w the rest. sgn=+1: epigraph (u >= xi); sgn=-1: hypograph."""

    sgn: float = 1.0

    def xi(self, w):
        raise NotImplementedError

    def phi(self, w):
        """The non-log-zeta barrier terms (e.g. -sum(log w))."""
        raise NotImplementedError

    def zeta(self, s):
        return self.sgn * (s[0] - self.xi(s[1:]))

    def barrier(self, s):
        return -jnp.log(self.zeta(s)) + self.phi(s[1:])

    # -- stable per-point state --------------------------------------------

    def point_aux(self, s):
        w = s[1:]
        zeta = self.zeta(s)
        grad_xi = jax.grad(self.xi)(w)
        hess_xi = jax.hessian(self.xi)(w)
        hess_phi = jax.hessian(self.phi)(w)
        Mw = hess_phi + self.sgn * hess_xi / zeta
        Lw, ok = linalg.cholesky_shifted(Mw)
        # v = grad(-log zeta) direction: a = dF_zeta du etc.
        a = self.sgn / zeta
        b = -self.sgn * grad_xi / zeta
        return {"zeta": zeta, "a": a, "b": b, "Mw_chol": Lw, "Mw_ok": ok,
                "grad_xi": grad_xi}

    # -- oracles ------------------------------------------------------------

    def inv_hess_prod(self, s, arr, aux=None):
        if aux is None:
            aux = self.point_aux(s)
        a, b, Lw = aux["a"], aux["b"], aux["Mw_chol"]
        one_d = arr.ndim == 1
        r = arr[:, None] if one_d else arr
        r_u, r_w = r[0, :], r[1:, :]
        y = r_u / a
        rhs_w = r_w - jnp.outer(b, y)
        x_w = linalg.cho_solve(Lw, rhs_w)
        x_u = (y - b @ x_w) / a
        out = jnp.concatenate([x_u[None, :], x_w], axis=0)
        return out[:, 0] if one_d else out

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def hess_prod(self, s, arr, aux=None):
        # autodiff hvp is numerically fine (the unstable direction appears
        # only as an explicit rank-1 term); keep base implementation
        return super().hess_prod(s, arr, aux)
