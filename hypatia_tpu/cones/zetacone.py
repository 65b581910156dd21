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

    #: subclasses with structured Mw (e.g. Kronecker-of-inverse plus low
    #: rank) set this and implement Mw_prod / Mw_solve; point_aux then need
    #: not materialize or factor the (n x n) Mw at all — the oracles become
    #: two-sided matrix products (`possemideftri.jl:126-195` style)
    has_closed_Mw = False

    def Mw_prod(self, aux, arr):
        """Mw @ arr for arr of shape (n, m), closed form (has_closed_Mw)."""
        raise NotImplementedError

    def Mw_solve(self, aux, arr):
        """Mw^{-1} @ arr for arr of shape (n, m) (has_closed_Mw)."""
        raise NotImplementedError

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
        Mw_inv = linalg.chol_inverse(Lw)
        # v = grad(-log zeta) direction: a = dF_zeta du etc.
        a = self.sgn / zeta
        b = -self.sgn * grad_xi / zeta
        return {"zeta": zeta, "a": a, "b": b, "Mw": Mw, "Mw_chol": Lw,
                "Mw_inv": Mw_inv, "Mw_ok": ok,
                "grad_phi": jax.grad(self.phi)(w)}

    # -- oracles ------------------------------------------------------------

    def inv_hess_prod(self, s, arr, aux=None):
        if aux is None:
            aux = self.point_aux(s)
        a, b = aux["a"], aux["b"]
        one_d = arr.ndim == 1
        r = arr[:, None] if one_d else arr
        r_u, r_w = r[0, :], r[1:, :]
        y = r_u / a
        rhs_w = r_w - jnp.outer(b, y)
        if self.has_closed_Mw:
            x_w = self.Mw_solve(aux, rhs_w)
        elif "Mw_inv" in aux:
            x_w = aux["Mw_inv"] @ rhs_w
        else:
            x_w = linalg.cho_solve(aux["Mw_chol"], rhs_w)
        x_u = (y - b @ x_w) / a
        out = jnp.concatenate([x_u[None, :], x_w], axis=0)
        return out[:, 0] if one_d else out

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def grad(self, s, aux=None):
        """grad F = -v + grad(phi) with v = (a, b) — pure aux lookups (no
        traced autodiff at the call site: TPU compile-size matters)."""
        if aux is None or "grad_phi" not in aux:
            aux = self.point_aux(s)
        return jnp.concatenate([(-aux["a"])[None], -aux["b"] + aux["grad_phi"]])

    def hess_prod(self, s, arr, aux=None):
        """H = v v' + blkdiag(0, Mw) with materialized Mw — matmuls only."""
        if aux is None or ("Mw" not in aux and not self.has_closed_Mw):
            aux = self.point_aux(s)
        a, b = aux["a"], aux["b"]
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        d_u, d_w = A[0, :], A[1:, :]
        vdot = a * d_u + b @ d_w
        H_u = a * vdot
        if self.has_closed_Mw:
            H_w = jnp.outer(b, vdot) + self.Mw_prod(aux, d_w)
        else:
            H_w = jnp.outer(b, vdot) + aux["Mw"] @ d_w
        out = jnp.concatenate([H_u[None, :], H_w], axis=0)
        return out[:, 0] if one_d else out

    def hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.hess_prod(s, eye, aux)

    def dder3(self, s, d, aux=None):
        # third-order directly from the barrier (the aux-based hess_prod is
        # not a pure function of s, so differentiate the barrier itself)
        def barrier_hvp(x):
            return jax.jvp(jax.grad(self.barrier), (x,), (d,))[1]

        return -0.5 * jax.jvp(barrier_hvp, (s,), (d,))[1]
