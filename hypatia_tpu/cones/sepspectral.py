"""Epigraph-of-perspective separable spectral cones.

(u, v, w): u >= v * tr h(w/v), over a cone of squares — either the
nonnegative vector cone (VectorCSqr) or PSD matrices (MatrixCSqr) — with
h one of four separable spectral functions.

Parity: `src/Cones/epipersepspectral/` (epipersepspectral.jl,
vectorcsqr.jl, matrixcsqr.jl, sepspectralfun.jl).  nu = 2 + d.
Barrier: -log(u - v tr h(w/v)) - log(v) - "logdet"(w).

The vector case rides the stable ZetaCone machinery directly.  The matrix
case (see `sepspectral_matrix.py`) needs explicit divided-difference
derivatives because autodiff through eigh breaks at degenerate eigenvalues.
"""

import functools

import numpy as np
import jax.numpy as jnp

from hypatia_tpu.cones.zetacone import ZetaCone
from hypatia_tpu.cones.centralray import solve_central_ray


def _eps(x):
    return jnp.finfo(x.dtype).eps


class SepSpectralFun:
    """Univariate convex function on positive reals, with conjugate info
    (`sepspectralfun.jl:17-117`)."""

    #: conjugate domain requires positive entries
    conj_dom_pos = False

    def h_val(self, x):
        raise NotImplementedError

    def h_der1(self, x):
        raise NotImplementedError

    def h_der2(self, x):
        raise NotImplementedError

    def h_der3(self, x):
        raise NotImplementedError

    def h_conj(self, x):
        raise NotImplementedError


class InvSSF(SepSpectralFun):
    """x -> 1/x (trace-inverse)."""

    conj_dom_pos = True

    def h_val(self, x):
        return jnp.sum(1.0 / x)

    def h_der1(self, x):
        return -x**-2

    def h_der2(self, x):
        return 2 * x**-3

    def h_der3(self, x):
        return -6 * x**-4

    def h_conj(self, x):
        return -2 * jnp.sum(jnp.sqrt(x))

    def __repr__(self):
        return "Inv"


class NegLogSSF(SepSpectralFun):
    """x -> -log(x)."""

    conj_dom_pos = True

    def h_val(self, x):
        return -jnp.sum(jnp.log(x))

    def h_der1(self, x):
        return -1.0 / x

    def h_der2(self, x):
        return x**-2

    def h_der3(self, x):
        return -2 * x**-3

    def h_conj(self, x):
        return -x.shape[-1] - jnp.sum(jnp.log(x))

    def __repr__(self):
        return "NegLog"


class NegEntropySSF(SepSpectralFun):
    """x -> x log(x)."""

    conj_dom_pos = False

    def h_val(self, x):
        return jnp.sum(x * jnp.log(x))

    def h_der1(self, x):
        return 1 + jnp.log(x)

    def h_der2(self, x):
        return 1.0 / x

    def h_der3(self, x):
        return -x**-2

    def h_conj(self, x):
        return jnp.sum(jnp.exp(-x - 1))

    def __repr__(self):
        return "NegEntropy"


class Power12SSF(SepSpectralFun):
    """x -> x^p for p in (1, 2]."""

    conj_dom_pos = False

    def __init__(self, p: float):
        assert 1 < p <= 2
        self.p = float(p)

    def h_val(self, x):
        return jnp.sum(x**self.p)

    def h_der1(self, x):
        return self.p * x ** (self.p - 1)

    def h_der2(self, x):
        return self.p * (self.p - 1) * x ** (self.p - 2)

    def h_der3(self, x):
        return self.p * (self.p - 1) * (self.p - 2) * x ** (self.p - 3)

    def h_conj(self, x):
        p = self.p
        q = p / (p - 1)
        return (p - 1) * jnp.sum(
            jnp.where(x >= 0, 0.0, (jnp.abs(x) / p) ** q))

    def __repr__(self):
        return f"Power12({self.p})"


class EpiPerSepSpectralVector(ZetaCone):
    """EpiPerSepSpectral over the nonnegative vector cone of squares
    (`vectorcsqr.jl`). Layout (u, v, w_1..w_d); stable ZetaCone oracles
    with wbar = (v, w)."""

    sgn = 1.0

    def __init__(self, h: SepSpectralFun, d: int, use_dual: bool = False):
        assert d >= 1
        super().__init__(2 + d, use_dual)
        self.h = h
        self.d = d

    def params_key(self):
        return (repr(self.h),)

    def __repr__(self):
        return (f"EpiPerSepSpectralVector({self.h!r}, d={self.d}"
                + (", use_dual=True)" if self.use_dual else ")"))

    @property
    def nu(self):
        return 2 + self.d

    def xi(self, wbar):
        v, w = wbar[0], wbar[1:]
        return v * self.h.h_val(w / v)

    def phi(self, wbar):
        return -jnp.sum(jnp.log(wbar))

    def feas(self, s):
        u, v, w = s[0], s[1], s[2:]
        ok = (v > _eps(s)) & jnp.all(w > _eps(s))
        v_safe = jnp.where(v > 0, v, 1.0)
        w_safe = jnp.where(w > 0, w, 1.0)
        zeta = u - v_safe * self.h.h_val(w_safe / v_safe)
        return ok & (zeta > _eps(s))

    def dual_feas(self, z):
        u, v, w = z[0], z[1], z[2:]
        ok = u > _eps(z)
        if self.h.conj_dom_pos:
            ok = ok & jnp.all(w > _eps(z))
            w = jnp.where(w > 0, w, 1.0)
        u_safe = jnp.where(u > 0, u, 1.0)
        return ok & (v - u * self.h.h_conj(w / u_safe) > _eps(z))

    def init_point(self):
        red = self._central_ray()
        return np.concatenate([red[:2], np.full(self.d, red[2])])

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        d = self.d

        def expand(red):
            return np.concatenate([red[:2], np.full(d, red[2])])

        # feasible start: u big enough for each h
        w0 = 1.0
        u0 = float(np.asarray(self.h.h_val(jnp.ones(d)))) + d + 2.0
        return solve_central_ray(self.barrier, expand, 3,
                                 np.array([u0, 1.0, w0]))
