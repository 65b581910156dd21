"""Polynomial envelope (Papp & Yildiz, arXiv:1712.01792).

Find the polynomial lower envelope of a set of random polynomials over a
box domain, integrated against the Clenshaw-Curtis quadrature weights.
Parity: `examples/polyenvelope/native.jl` — primal form puts the WSOS
cones in the primal (c = -w, G stacks identities), dual form transposes
(A stacks identities, b = w) with use_dual'd WSOS cones.
"""

import math

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate


def build(n: int = 2, rand_halfdeg: int = 2, num_polys: int = 3,
          env_halfdeg: int = 2, primal_wsos: bool = True, seed: int = 1):
    assert rand_halfdeg <= env_halfdeg
    rng = np.random.default_rng(seed)
    dom = BoxDomain(-np.ones(n), np.ones(n))
    U, pts, Ps, V, w = interpolate(dom, env_halfdeg, get_quadr=True,
                                   seed=seed)

    # random polynomials expressed in the interpolant basis: evaluate a
    # random coefficient combination of the first L columns of P0
    L = math.comb(n + rand_halfdeg, n)
    coeffs = rng.integers(-9, 10, size=(L, num_polys)).astype(float)
    c_or_h = (np.asarray(Ps[0])[:, :L] @ coeffs).reshape(-1, order="F")

    if primal_wsos:
        c = -np.asarray(w)
        A = np.zeros((0, U))
        b = np.zeros(0)
        G = np.tile(np.eye(U), (num_polys, 1))
        h = c_or_h
    else:
        c = c_or_h
        A = np.tile(np.eye(U), (1, num_polys))
        b = np.asarray(w)
        G = -np.eye(num_polys * U)
        h = np.zeros(num_polys * U)

    cone_list = [cones.WSOSInterpNonnegative(U, Ps,
                                             use_dual=not primal_wsos)
                 for _ in range(num_polys)]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(n=1, rand_halfdeg=2, num_polys=2, env_halfdeg=2,
                primal_wsos=True),
           dict(n=1, rand_halfdeg=2, num_polys=2, env_halfdeg=2,
                primal_wsos=False)]
FAST = [dict(n=2, rand_halfdeg=2, num_polys=3, env_halfdeg=2,
             primal_wsos=True),
        dict(n=3, rand_halfdeg=3, num_polys=3, env_halfdeg=3,
             primal_wsos=False)]
BENCH = [dict(n=2, rand_halfdeg=5, num_polys=5, env_halfdeg=7,
              primal_wsos=True)]
