"""Polynomial norm bound: find f with f >= ||(g_1..g_m)||_2 (or l1)
pointwise on a box, minimizing the integral of f.

Formulations: the WSOS norm cones (WSOSInterpEpiNormEucl / One), the
scalar split (l1 via pairs of WSOS nonnegative polynomials), or the
WSOS matrix arrow lift. Parity: `examples/polynorm/JuMP.jl` (the
kron-lifted scalar variant of the matrix form is not ported).
"""

import math

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate

RT2 = np.sqrt(2.0)


def build(n: int = 1, rand_halfdeg: int = 1, epi_halfdeg: int = 1,
          num_polys: int = 2, use_l1: bool = False,
          use_norm_cone: bool = True, seed: int = 1):
    assert epi_halfdeg >= rand_halfdeg
    rng = np.random.default_rng(seed)
    dom = BoxDomain(-np.ones(n), np.ones(n))
    U, pts, Ps, V, w = interpolate(dom, epi_halfdeg, calc_V=True,
                                   get_quadr=True, seed=seed)
    rand_U = math.comb(n + 2 * rand_halfdeg, n)
    coeffs = rng.integers(-9, 10, size=(rand_U, num_polys)).astype(float)
    polys = np.asarray(V)[:, :rand_U] @ coeffs   # (U, num_polys)

    c = np.asarray(w)          # min integral of f; vars f (U)
    A0 = np.zeros((0, U))
    b0 = np.zeros(0)

    if use_norm_cone:
        cone_cls = (cones.WSOSInterpEpiNormOne if use_l1
                    else cones.WSOSInterpEpiNormEucl)
        R = num_polys + 1
        G = np.zeros((R * U, U))
        G[:U] = -np.eye(U)
        h = np.concatenate([np.zeros(U), polys.T.reshape(-1)])
        return Model(c, A0, b0, G, h, [cone_cls(R, U, Ps)])

    if use_l1:
        # scalar split: f - sum_i (p+_i + p-_i) wsos, polys_i = p+_i - p-_i,
        # p+-_i wsos; vars (f, p+_1, p-_1, ..., p+_m, p-_m)
        m = num_polys
        nv = U * (1 + 2 * m)
        cfull = np.concatenate([c, np.zeros(2 * m * U)])
        A = np.zeros((m * U, nv))
        b = np.zeros(m * U)
        for i in range(m):
            A[i * U:(i + 1) * U, U * (1 + 2 * i):U * (2 + 2 * i)] = np.eye(U)
            A[i * U:(i + 1) * U, U * (2 + 2 * i):U * (3 + 2 * i)] = -np.eye(U)
            b[i * U:(i + 1) * U] = polys[:, i]
        G_rows, h_rows, cone_list = [], [], []
        Gf = np.zeros((U, nv))
        Gf[:, :U] = -np.eye(U)
        for i in range(m):
            Gf[:, U * (1 + 2 * i):U * (3 + 2 * i)] = np.tile(np.eye(U),
                                                             (1, 2))
        G_rows.append(Gf)
        h_rows.append(np.zeros(U))
        cone_list.append(cones.WSOSInterpNonnegative(U, Ps))
        for i in range(2 * m):
            Gp = np.zeros((U, nv))
            Gp[:, U * (1 + i):U * (2 + i)] = -np.eye(U)
            G_rows.append(Gp)
            h_rows.append(np.zeros(U))
            cone_list.append(cones.WSOSInterpNonnegative(U, Ps))
        return Model(cfull, A, b, np.vstack(G_rows),
                     np.concatenate(h_rows), cone_list)

    # WSOS matrix arrow lift: R x R svec blocks (1,1)=f, (1,j)=rt2 g_j,
    # (j,j)=f
    R = num_polys + 1
    sdim = R * (R + 1) // 2
    G = np.zeros((sdim * U, U))
    h = np.zeros(sdim * U)

    def blk(i, j):  # svec slot (column-major upper) for (i, j)
        lo, hi = min(i, j), max(i, j)
        return hi * (hi + 1) // 2 + lo

    G[blk(0, 0) * U:(blk(0, 0) + 1) * U] = -np.eye(U)
    for jcol in range(1, R):
        s = blk(0, jcol)
        h[s * U:(s + 1) * U] = RT2 * polys[:, jcol - 1]
        s = blk(jcol, jcol)
        G[s * U:(s + 1) * U] = -np.eye(U)
    return Model(c, A0, b0, G, h,
                 [cones.WSOSInterpPosSemidefTri(R, U, Ps)])


MINIMAL = [dict(n=1, rand_halfdeg=1, epi_halfdeg=1, num_polys=2,
                use_l1=True, use_norm_cone=True),
           dict(n=1, rand_halfdeg=1, epi_halfdeg=1, num_polys=2,
                use_l1=True, use_norm_cone=False),
           dict(n=1, rand_halfdeg=1, epi_halfdeg=1, num_polys=2,
                use_l1=False, use_norm_cone=True),
           dict(n=1, rand_halfdeg=1, epi_halfdeg=1, num_polys=2,
                use_l1=False, use_norm_cone=False)]
FAST = [dict(n=2, rand_halfdeg=2, epi_halfdeg=2, num_polys=2,
             use_l1=True, use_norm_cone=True),
        dict(n=2, rand_halfdeg=2, epi_halfdeg=2, num_polys=2,
             use_l1=False, use_norm_cone=True),
        dict(n=2, rand_halfdeg=2, epi_halfdeg=2, num_polys=2,
             use_l1=False, use_norm_cone=False)]
BENCH = [dict(n=2, rand_halfdeg=3, epi_halfdeg=3, num_polys=6,
              use_l1=False, use_norm_cone=True)]
