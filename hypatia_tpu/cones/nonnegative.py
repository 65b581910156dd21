"""Nonnegative orthant cone.

x >= 0 with barrier -sum(log(x)), nu = dim. Closed-form diagonal oracles;
reference: `src/Cones/nonnegative.jl`.
"""

import numpy as np
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone


class Nonnegative(Cone):
    has_sqrt_oracles = True

    def __init__(self, dim: int, use_dual: bool = False):
        assert dim >= 1
        super().__init__(dim, use_dual)

    @property
    def nu(self):
        return self.dim

    def init_point(self):
        return np.ones(self.dim)

    def barrier(self, s):
        return -jnp.sum(jnp.log(s))

    def feas(self, s):
        return jnp.all(s > jnp.finfo(s.dtype).eps)

    def dual_feas(self, z):
        return jnp.all(z > jnp.finfo(z.dtype).eps)

    def point_aux(self, s):
        return {}

    def grad(self, s, aux=None):
        return -1.0 / s

    def hess(self, s, aux=None):
        return jnp.diag(s**-2)

    def hess_prod(self, s, arr, aux=None):
        quot = arr / (s**2 if arr.ndim == 1 else (s**2)[:, None])
        return quot

    def inv_hess_prod(self, s, arr, aux=None):
        return arr * (s**2 if arr.ndim == 1 else (s**2)[:, None])

    def inv_hess(self, s, aux=None):
        return jnp.diag(s**2)

    def sqrt_hess_prod(self, s, arr, aux=None):
        return arr / (s if arr.ndim == 1 else s[:, None])

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        return arr * (s if arr.ndim == 1 else s[:, None])

    def dder3(self, s, d, aux=None):
        return (d / s) ** 2 / s

    def get_proxsqr(self, s, z, irtmu, aux=None, use_max_prox=True):
        """Non-primitive cone: per-coordinate proximity aggregated by max or
        sum (`src/Cones/nonnegative.jl:137-145`)."""
        terms = (s * z * irtmu - 1.0) ** 2
        return jnp.max(terms) if use_max_prox else jnp.sum(terms)
