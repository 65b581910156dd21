"""Closed-form vector cones.

Definitions, barriers, and feasibility checks follow the reference cone
library (file:line cites per cone); oracles default to the autodiff
machinery in `base.Cone`, with closed forms added where they pay.

Cones here:
- EpiPerSquare        (rotated second-order cone; `epipersquare.jl`)
- EpiNormInf          (l_inf epigraph; `epinorminf.jl`, real case)
- GeneralizedPower    (`generalizedpower.jl`)
- HypoGeoMean         (`hypogeomean.jl`)
- HypoPowerMean       (`hypopowermean.jl`)
- HypoPerLog          (`hypoperlog.jl`)
- EpiRelEntropy       (`epirelentropy.jl`)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.cones.zetacone import ZetaCone
from hypatia_tpu.cones.epinormeucl import EpiNormEucl
from hypatia_tpu.cones.centralray import solve_central_ray


def _eps(x):
    return jnp.finfo(x.dtype).eps


class EpiPerSquare(Cone):
    """Rotated second-order cone {(u,v,w): 2uv >= ||w||^2, u,v >= 0}.

    Barrier -log(2uv - ||w||^2), nu = 2 (`epipersquare.jl:1-60`).
    Oracles delegate to EpiNormEucl through the orthogonal symmetric rotation
    T: (u,v,w) -> ((u+v)/rt2, (u-v)/rt2, w), under which this cone maps to
    the second-order cone and H_rsoc(s) = T H_soc(T s) T.
    """

    has_sqrt_oracles = True

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 3
        super().__init__(dim, use_dual)
        self._soc = EpiNormEucl(dim)

    @property
    def nu(self):
        return 2

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[0] = pt[1] = 1.0
        return pt

    def _rot(self, s):
        rt2i = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=s.dtype))
        if s.ndim == 1:
            return jnp.concatenate([
                ((s[0] + s[1]) * rt2i)[None], ((s[0] - s[1]) * rt2i)[None],
                s[2:]])
        return jnp.concatenate([
            ((s[0:1] + s[1:2]) * rt2i), ((s[0:1] - s[1:2]) * rt2i), s[2:]],
            axis=0)

    def barrier(self, s):
        dist = s[0] * s[1] - jnp.sum(s[2:] ** 2) / 2
        return -jnp.log(2 * dist)

    def feas(self, s):
        dist = s[0] * s[1] - jnp.sum(s[2:] ** 2) / 2
        return (s[0] > _eps(s)) & (s[1] > _eps(s)) & (dist > _eps(s))

    def dual_feas(self, z):
        dist = z[0] * z[1] - jnp.sum(z[2:] ** 2) / 2
        return (z[0] > _eps(z)) & (z[1] > _eps(z)) & (dist > _eps(z))

    def point_aux(self, s):
        return {}

    def grad(self, s, aux=None):
        return self._rot(self._soc.grad(self._rot(s)))

    def hess_prod(self, s, arr, aux=None):
        return self._rot(self._soc.hess_prod(self._rot(s), self._rot(arr)))

    def inv_hess_prod(self, s, arr, aux=None):
        return self._rot(self._soc.inv_hess_prod(self._rot(s), self._rot(arr)))

    def hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.hess_prod(s, eye, aux)

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def sqrt_hess_prod(self, s, arr, aux=None):
        # U = U_soc(Ts) T satisfies U'U = T H_soc T = H
        return self._soc.sqrt_hess_prod(self._rot(s), self._rot(arr))

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        # Ubar = U_soc(Ts)^-T T satisfies Ubar'Ubar = T H_soc^-1 T = H^-1
        return self._soc.inv_sqrt_hess_prod(self._rot(s), self._rot(arr))

    def dder3(self, s, d, aux=None):
        return self._rot(self._soc.dder3(self._rot(s), self._rot(d)))


class EpiNormInf(Cone):
    """(u, w): u >= ||w||_inf (real or complex w).

    Barrier sum_i -log(u^2 - |w_i|^2) + (d-1) log u, nu = d+1
    (`epinorminf.jl:1-60`). Dual cone is the l_1 epigraph. Closed-form
    **arrow-structured** Hessian and O(d) Schur-complement inverse
    (`epinorminf.jl:28-42, 298-311` semantics). Complex entries are stored
    interleaved (re, im); dim = 1 + 2d.
    """

    def __init__(self, dim: int, is_complex: bool = False,
                 use_dual: bool = False):
        assert dim >= 2
        super().__init__(dim, use_dual)
        self.is_complex = bool(is_complex)
        if is_complex:
            assert (dim - 1) % 2 == 0
            self.d = (dim - 1) // 2
        else:
            self.d = dim - 1

    def params_key(self):
        return (self.is_complex,)

    @property
    def nu(self):
        return self.d + 1

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[0] = np.sqrt(self.nu)
        return pt

    def _absw2(self, w):
        if self.is_complex:
            return w[0::2] ** 2 + w[1::2] ** 2
        return w * w

    def barrier(self, s):
        u, w = s[0], s[1:]
        return (-jnp.sum(jnp.log(u * u - self._absw2(w)))
                + (self.d - 1) * jnp.log(u))

    def feas(self, s):
        u, w = s[0], s[1:]
        return (u > _eps(s)) & (u * u - jnp.max(self._absw2(w)) > _eps(s))

    def dual_feas(self, z):
        norm1 = jnp.sum(jnp.sqrt(self._absw2(z[1:])))
        return (z[0] > _eps(z)) & (z[0] - norm1 > _eps(z))

    def grad(self, s, aux=None):
        u, w = s[0], s[1:]
        den = u * u - self._absw2(w)
        gu = -jnp.sum(2 * u / den) + (self.d - 1) / u
        if self.is_complex:
            deni = jnp.repeat(den, 2)
        else:
            deni = den
        gw = 2 * w / deni
        return jnp.concatenate([gu[None], gw])

    def point_aux(self, s):
        """Arrow Hessian entries: Huu, border Hui, diagonal Hii (complex:
        2x2 blocks per entry, still closed-form invertible)."""
        u, w = s[0], s[1:]
        den = u * u - self._absw2(w)
        Huu = jnp.sum(2 * (u * u + self._absw2(w)) / den**2) \
            - (self.d - 1) / u**2
        if self.is_complex:
            deni = jnp.repeat(den, 2)
        else:
            deni = den
        Hui = -4 * u * w / deni**2
        # H_wi_wj within an entry: 2/den delta + 4 wi wj / den^2
        return {"den": den, "deni": deni, "u": u, "w": w,
                "Huu": Huu, "Hui": Hui}

    def _get_aux(self, s, aux):
        if aux is None or "Hui" not in aux:
            return self.point_aux(s)
        return aux

    def _wblock_prod(self, aux, vw):
        """(H restricted to w coords) @ vw: diag 2/den + 4 w w'/den^2 with
        the rank-1 coupling only within each complex entry."""
        w, deni = aux["w"], aux["deni"]
        base = 2 * vw / deni
        if self.is_complex:
            # within-entry coupling: (w_re, w_im) outer product
            wr, wi_ = w[0::2], w[1::2]
            vr, vi = vw[0::2], vw[1::2]
            dots = wr * vr + wi_ * vi
            den = aux["den"]
            extra = 4 * dots / den**2
            out = base.at[0::2].add(extra * wr)
            out = out.at[1::2].add(extra * wi_)
            return out
        return base + 4 * w * (w * vw) / deni**2

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        du, dw = A[0, :], A[1:, :]
        Huu, Hui = aux["Huu"], aux["Hui"]
        Hu = Huu * du + Hui @ dw
        Hw = jnp.outer(Hui, du) + jax.vmap(
            lambda v: self._wblock_prod(aux, v), in_axes=1, out_axes=1)(dw)
        out = jnp.concatenate([Hu[None, :], Hw], axis=0)
        return out[:, 0] if one_d else out

    def hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.hess_prod(s, eye, aux)

    def inv_hess_prod(self, s, arr, aux=None):
        """Arrow inverse via Schur complement on u, in the analytically
        simplified cancellation-free forms of `epinorminf.jl:298-311`:
        schur = (1-d)/u^2 + sum 2/(u^2+|wj|^2),
        Winv Hui = -2 u wj / (u^2+|wj|^2)."""
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        ru, rw = A[0, :], A[1:, :]
        u, w, den = aux["u"], aux["w"], aux["den"]
        u2pw2 = u * u + self._absw2(w)
        if self.is_complex:
            u2pw2i = jnp.repeat(u2pw2, 2)
        else:
            u2pw2i = u2pw2
        Hui = aux["Hui"]
        Winv_hui = -2 * u * w / u2pw2i
        schur = (1 - self.d) / u**2 + jnp.sum(2.0 / u2pw2)
        solve_w = lambda v: self._wblock_solve(aux, v)
        Winv_rw = jax.vmap(solve_w, in_axes=1, out_axes=1)(rw)
        xu = (ru - Winv_hui @ rw) / schur
        xw = Winv_rw - jnp.outer(Winv_hui, xu)
        out = jnp.concatenate([xu[None, :], xw], axis=0)
        return out[:, 0] if one_d else out

    def _wblock_solve(self, aux, rw):
        """Solve (diag(2/den) + within-entry 4 ww'/den^2) x = rw, O(d)."""
        w, deni, den = aux["w"], aux["deni"], aux["den"]
        if self.is_complex:
            wr, wi_ = w[0::2], w[1::2]
            rr, ri = rw[0::2], rw[1::2]
            a_d = 2 / den          # block diagonal scalar
            c = 4 / den**2
            vdotr = wr * rr + wi_ * ri
            denom = a_d + c * (wr**2 + wi_**2)
            # Sherman-Morrison: x = r/a - (c (v.r) / (a (a + c|v|^2))) v
            corr = c * vdotr / (a_d * denom)
            out = jnp.zeros_like(rw)
            out = out.at[0::2].set(rr / a_d - corr * wr)
            out = out.at[1::2].set(ri / a_d - corr * wi_)
            return out
        a_d = 2 / deni
        c = 4 / deni**2
        denom = a_d + c * w * w
        corr = c * (w * rw) / (a_d * denom)
        return rw / a_d - corr * w


class GeneralizedPower(Cone):
    """(u, w): prod(u_i^alpha_i) >= ||w||, u >= 0.

    Barrier -log(prod u^(2 alpha) - ||w||^2) - sum (1-alpha_i) log u_i,
    nu = len(alpha)+1 (`generalizedpower.jl:1-70`).
    """

    def __init__(self, alpha, w_dim: int, use_dual: bool = False):
        alpha = np.asarray(alpha, dtype=np.float64)
        assert w_dim >= 1
        assert np.all(alpha > 0) and abs(alpha.sum() - 1) < 1e-12
        super().__init__(len(alpha) + w_dim, use_dual)
        self.alpha = alpha
        self.m = len(alpha)
        self.w_dim = w_dim

    def params_key(self):
        return (self.alpha.tobytes(),)

    @property
    def nu(self):
        return self.m + 1

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[:self.m] = np.sqrt(1 + self.alpha)
        return pt

    def barrier(self, s):
        u, w = s[:self.m], s[self.m:]
        a = jnp.asarray(self.alpha, dtype=s.dtype)
        z = jnp.exp(2 * jnp.sum(a * jnp.log(u)))
        return -jnp.log(z - jnp.sum(w * w)) - jnp.sum((1 - a) * jnp.log(u))

    def feas(self, s):
        u, w = s[:self.m], s[self.m:]
        a = jnp.asarray(self.alpha, dtype=s.dtype)
        ok_u = jnp.all(u > _eps(s))
        u_safe = jnp.where(u > 0, u, 1.0)
        z = jnp.exp(2 * jnp.sum(a * jnp.log(u_safe)))
        return ok_u & (z - jnp.sum(w * w) > _eps(s))

    def dual_feas(self, z):
        u, w = z[:self.m], z[self.m:]
        a = jnp.asarray(self.alpha, dtype=z.dtype)
        ok_u = jnp.all(u > _eps(z))
        u_safe = jnp.where(u > 0, u, 1.0)
        p = jnp.exp(2 * jnp.sum(a * jnp.log(u_safe / a)))
        return ok_u & (p - jnp.sum(w * w) > _eps(z))


class _CentralRayMixin:
    """init_point via the exact central-ray Newton solve (replaces the
    reference's lookup tables; see centralray.py)."""

    def init_point(self):
        return self._central_point()


class HypoGeoMean(_CentralRayMixin, ZetaCone):
    """(u, w): u <= geomean(w), w >= 0.

    Barrier -log(geomean(w) - u) - sum log w, nu = dim
    (`hypogeomean.jl:1-60`). Stable oracles via ZetaCone.
    """

    sgn = -1.0

    def xi(self, w):
        return jnp.exp(jnp.mean(jnp.log(w)))

    def phi(self, w):
        return -jnp.sum(jnp.log(w))

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 2
        super().__init__(dim, use_dual)
        self.d = dim - 1

    @property
    def nu(self):
        return self.dim

    def feas(self, s):
        u, w = s[0], s[1:]
        ok_w = jnp.all(w > _eps(s))
        w_safe = jnp.where(w > 0, w, 1.0)
        phi = jnp.exp(jnp.mean(jnp.log(w_safe)))
        return ok_w & (phi - u > _eps(s))

    def dual_feas(self, z):
        u, w = z[0], z[1:]
        ok = (u < -_eps(z)) & jnp.all(w > _eps(z))
        w_safe = jnp.where(w > 0, w, 1.0)
        val = self.d * jnp.exp(jnp.mean(jnp.log(w_safe))) + u
        return ok & (val > _eps(z))

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        d = self.d
        expand = lambda red: np.concatenate([[red[0]], np.full(d, red[1])])
        return solve_central_ray(self.barrier, expand, 2, np.array([-1.0, 1.0]))

    def _central_point(self):
        red = self._central_ray()
        return np.concatenate([[red[0]], np.full(self.d, red[1])])


class HypoPowerMean(_CentralRayMixin, ZetaCone):
    """(u, w): u <= prod(w_i^alpha_i), w >= 0.

    Barrier -log(prod w^alpha - u) - sum log w, nu = dim
    (`hypopowermean.jl:1-60`). Stable oracles via ZetaCone.
    """

    sgn = -1.0

    def xi(self, w):
        a = jnp.asarray(self.alpha, dtype=w.dtype)
        return jnp.exp(jnp.sum(a * jnp.log(w)))

    def phi(self, w):
        return -jnp.sum(jnp.log(w))

    def __init__(self, alpha, use_dual: bool = False):
        alpha = np.asarray(alpha, dtype=np.float64)
        assert np.all(alpha > 0) and abs(alpha.sum() - 1) < 1e-12
        super().__init__(len(alpha) + 1, use_dual)
        self.alpha = alpha
        self.d = len(alpha)

    def params_key(self):
        return (self.alpha.tobytes(),)

    @property
    def nu(self):
        return self.dim

    def feas(self, s):
        u, w = s[0], s[1:]
        a = jnp.asarray(self.alpha, dtype=s.dtype)
        ok_w = jnp.all(w > _eps(s))
        w_safe = jnp.where(w > 0, w, 1.0)
        phi = jnp.exp(jnp.sum(a * jnp.log(w_safe)))
        return ok_w & (phi - u > _eps(s))

    def dual_feas(self, z):
        u, w = z[0], z[1:]
        a = jnp.asarray(self.alpha, dtype=z.dtype)
        ok = (u < -_eps(z)) & jnp.all(w > _eps(z))
        w_safe = jnp.where(w > 0, w, 1.0)
        val = jnp.exp(jnp.sum(a * jnp.log(w_safe / a))) + u
        return ok & (val > _eps(z))

    def _central_point(self):
        d = self.d
        expand = lambda red: np.concatenate([[red[0]], red[1:]])
        x0 = np.concatenate([[-1.0], np.ones(d)])
        red = solve_central_ray(self.barrier, expand, d + 1, x0)
        return expand(red)


class HypoPerLog(_CentralRayMixin, ZetaCone):
    """(u, v, w): u <= v sum log(w_i/v), v >= 0, w >= 0.

    Barrier -log(v sum log(w/v) - u) - sum log w - log v, nu = dim
    (`hypoperlog.jl:1-60`). Stable oracles via ZetaCone (wbar = (v, w)).
    """

    sgn = -1.0

    def xi(self, wbar):
        v, w = wbar[0], wbar[1:]
        return v * jnp.sum(jnp.log(w / v))

    def phi(self, wbar):
        return -jnp.sum(jnp.log(wbar))

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 3
        super().__init__(dim, use_dual)
        self.d = dim - 2

    @property
    def nu(self):
        return self.dim

    def feas(self, s):
        u, v, w = s[0], s[1], s[2:]
        ok = (v > _eps(s)) & jnp.all(w > _eps(s))
        v_safe = jnp.where(v > 0, v, 1.0)
        w_safe = jnp.where(w > 0, w, 1.0)
        zeta = v * jnp.sum(jnp.log(w_safe / v_safe)) - u
        return ok & (zeta > _eps(s))

    def dual_feas(self, z):
        u, v, w = z[0], z[1], z[2:]
        ok = (u < -_eps(z)) & jnp.all(w > _eps(z))
        u_safe = jnp.where(u < 0, u, -1.0)
        w_safe = jnp.where(w > 0, w, 1.0)
        sumlog = jnp.sum(jnp.log(w_safe / -u_safe))
        return ok & (v - u * (sumlog + self.d) > _eps(z))

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        d = self.d
        expand = lambda red: np.concatenate([red[:2], np.full(d, red[2])])
        return solve_central_ray(
            self.barrier, expand, 3, np.array([-1.0, 1.0, 2.0]))

    def _central_point(self):
        red = self._central_ray()
        return np.concatenate([red[:2], np.full(self.d, red[2])])


class EpiRelEntropy(_CentralRayMixin, ZetaCone):
    """(u, v, w): u >= sum w_i log(w_i/v_i), v >= 0, w >= 0.

    Barrier -log(u - sum w log(w/v)) - sum log v - sum log w, nu = dim
    (`epirelentropy.jl:1-60`). Layout (u, v_1..v_d, w_1..w_d).
    Stable oracles via ZetaCone (wbar = (v, w)).
    """

    sgn = 1.0

    def xi(self, wbar):
        v, w = wbar[:self.d], wbar[self.d:]
        return jnp.sum(w * jnp.log(w / v))

    def phi(self, wbar):
        return -jnp.sum(jnp.log(wbar))

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 3 and dim % 2 == 1
        super().__init__(dim, use_dual)
        self.d = (dim - 1) // 2

    @property
    def nu(self):
        return self.dim

    def _split(self, s):
        return s[0], s[1:1 + self.d], s[1 + self.d:]

    def feas(self, s):
        u, v, w = self._split(s)
        ok = jnp.all(v > _eps(s)) & jnp.all(w > _eps(s))
        v_safe = jnp.where(v > 0, v, 1.0)
        w_safe = jnp.where(w > 0, w, 1.0)
        z = u - jnp.sum(w_safe * jnp.log(w_safe / v_safe))
        return ok & (z > _eps(s))

    def dual_feas(self, z):
        u, v, w = self._split(z)
        ok = (u > _eps(z)) & jnp.all(v > _eps(z))
        u_safe = jnp.where(u > 0, u, 1.0)
        v_safe = jnp.where(v > 0, v, 1.0)
        vals = u * (1 + jnp.log(v_safe / u_safe)) + w
        return ok & jnp.all(vals > _eps(z))

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        d = self.d
        expand = lambda red: np.concatenate(
            [[red[0]], np.full(d, red[1]), np.full(d, red[2])])
        return solve_central_ray(
            self.barrier, expand, 3, np.array([1.0, 1.0, 0.5]))

    def _central_point(self):
        red = self._central_ray()
        return np.concatenate(
            [[red[0]], np.full(self.d, red[1]), np.full(self.d, red[2])])
