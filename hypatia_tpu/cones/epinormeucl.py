"""Epigraph of Euclidean norm (second-order cone).

(u, w): u >= ||w||_2, barrier -log(u^2 - ||w||^2), nu = 2.
Closed-form rank-1 +/- diagonal Hessian and inverse; reference:
`src/Cones/epinormeucl.jl`.
"""

import numpy as np
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone


def _dist(s):
    """(u^2 - ||w||^2) / 2"""
    return (s[0] ** 2 - jnp.sum(s[1:] ** 2)) / 2


class EpiNormEucl(Cone):
    has_sqrt_oracles = True

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 2
        super().__init__(dim, use_dual)

    @property
    def nu(self):
        return 2

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[0] = np.sqrt(2.0)
        return pt

    def barrier(self, s):
        return -jnp.log(2 * _dist(s))

    def feas(self, s):
        eps = jnp.finfo(s.dtype).eps
        return (s[0] > eps) & (_dist(s) > eps)

    def dual_feas(self, z):
        eps = jnp.finfo(z.dtype).eps
        dual_dist = z[0] ** 2 - jnp.sum(z[1:] ** 2)
        return (z[0] > eps) & (dual_dist > 2 * eps)

    def point_aux(self, s):
        return {"dist": _dist(s)}

    def _get_dist(self, s, aux):
        if aux is not None and "dist" in aux:
            return aux["dist"]
        return _dist(s)

    def grad(self, s, aux=None):
        dist = self._get_dist(s, aux)
        g = s / dist
        return g.at[0].multiply(-1)

    def hess_prod(self, s, arr, aux=None):
        """H = (g g' + J/dist) with J = diag(-1, I); reference
        `epinormeucl.jl:92-119`."""
        dist = self._get_dist(s, aux)
        g = self.grad(s, aux)
        if arr.ndim == 1:
            ga = jnp.dot(g, arr)
            prod = ga * g + arr / dist
            return prod.at[0].add(-2 * arr[0] / dist)
        ga = g @ arr  # (m,)
        prod = jnp.outer(g, ga) + arr / dist
        return prod.at[0, :].add(-2 * arr[0, :] / dist)

    def inv_hess_prod(self, s, arr, aux=None):
        """Hi = s s' - dist*J (rank-1 plus diagonal)."""
        dist = self._get_dist(s, aux)
        if arr.ndim == 1:
            sa = jnp.dot(s, arr)
            prod = sa * s + dist * arr
            return prod.at[0].add(-2 * dist * arr[0])
        sa = s @ arr
        prod = jnp.outer(s, sa) + dist * arr
        return prod.at[0, :].add(-2 * dist * arr[0, :])

    def hess(self, s, aux=None):
        dist = self._get_dist(s, aux)
        g = self.grad(s, aux)
        H = jnp.outer(g, g) + jnp.eye(self.dim, dtype=s.dtype) / dist
        return H.at[0, 0].add(-2 / dist)

    def inv_hess(self, s, aux=None):
        dist = self._get_dist(s, aux)
        Hi = jnp.outer(s, s) + dist * jnp.eye(self.dim, dtype=s.dtype)
        return Hi.at[0, 0].add(-2 * dist)

    def sqrt_hess_prod(self, s, arr, aux=None):
        """Closed-form hyperbolic-Householder sqrt-Hessian product
        (semantics of `epinormeucl.jl:159-182`)."""
        dist = self._get_dist(s, aux)
        u, w = s[0], s[1:]
        rt2 = jnp.sqrt(jnp.asarray(2.0, dtype=s.dtype))
        distrt2 = dist * rt2
        rtdist = jnp.sqrt(dist)
        urtdist = u + rtdist * rt2
        a = arr if arr.ndim == 2 else arr[:, None]
        a0, aw = a[0, :], a[1:, :]
        dotww = w @ aw
        c0 = (u * a0 - dotww) / distrt2
        wmul = (dotww / urtdist - a0) / distrt2
        cw = jnp.outer(w, wmul) + aw / rtdist
        out = jnp.concatenate([c0[None, :], cw], axis=0)
        return out[:, 0] if arr.ndim == 1 else out

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        """Inverse of the sqrt-Hessian product (`epinormeucl.jl:184-206`)."""
        dist = self._get_dist(s, aux)
        u, w = s[0], s[1:]
        rt2 = jnp.sqrt(jnp.asarray(2.0, dtype=s.dtype))
        rtdist = jnp.sqrt(dist)
        urtdist = u + rtdist * rt2
        a = arr if arr.ndim == 2 else arr[:, None]
        a0, aw = a[0, :], a[1:, :]
        dotww = w @ aw
        c0 = (u * a0 + dotww) / rt2
        wmul = (dotww / urtdist + a0) / rt2
        cw = jnp.outer(w, wmul) + aw * rtdist
        out = jnp.concatenate([c0[None, :], cw], axis=0)
        return out[:, 0] if arr.ndim == 1 else out

    def dder3(self, s, d, aux=None):
        """Closed form (semantics of `epinormeucl.jl:208-228`)."""
        dist = self._get_dist(s, aux)
        u, w = s[0], s[1:]
        d0, dw = d[0], d[1:]
        jdotpd = u * d0 - jnp.dot(w, dw)
        Hd = self.hess_prod(s, d, aux)
        dotdHd = -jnp.dot(d, Hd)
        dotpHd = jnp.dot(s, Hd)
        out = Hd * jdotpd
        out = out.at[1:].add(dotdHd * w + dotpHd * dw)
        out = out.at[0].add(-dotdHd * u - dotpHd * d0)
        return out / (2 * dist)
