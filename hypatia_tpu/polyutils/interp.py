"""Real polynomial interpolation for WSOS cones.

Produces (U, pts, Ps, V, w): U interpolation points, the interpolant-basis
matrices Ps = [P0, sqrt(g_i) * P0sub, ...], optional Chebyshev Vandermonde V
and Clenshaw-Curtis-type quadrature weights w.

Parity: `src/PolyUtils/realinterp.jl` — sample-based QR-Fekete point
selection for general domains, and box rules (Chebyshev points n=1, Padua
points n=2, approximate Fekete n>2).
"""

import itertools
import math

import numpy as np
import scipy.linalg


def get_L(n, d):
    return math.comb(n + d, n)


def get_U(n, d):
    return math.comb(n + 2 * d, n)


def n_deg_exponents(n, deg):
    """All exponent tuples of total degree <= deg, ordered by total degree
    (matches Combinatorics.multiexponents order: per degree, lexicographic
    with first variable highest)."""
    expos = []
    for t in range(deg + 1):
        # multiexponents(n, t): compositions of t into n parts, in colex-ish
        # order; replicate Julia's order (first part decreasing)
        for comp in _compositions(n, t):
            expos.append(comp)
    return expos


def _compositions(n, t):
    """Compositions of t into n nonnegative parts, Julia multiexponents
    order."""
    if n == 1:
        yield (t,)
        return
    for first in range(t, -1, -1):
        for rest in _compositions(n - 1, t - first):
            yield (first,) + rest


def cheb2_pts(k):
    """k Chebyshev points of the second kind on [-1, 1]."""
    return np.array([-np.cos(np.pi * j / (k - 1)) for j in range(k)])


def calc_univariate_chebyshev(pts_i, d):
    """Chebyshev polynomial evaluations T_0..T_d at points (npts, d+1)."""
    npts = pts_i.size
    u = np.zeros((npts, d + 1))
    u[:, 0] = 1.0
    if d >= 1:
        u[:, 1] = pts_i
    for t in range(2, d + 1):
        u[:, t] = 2 * pts_i * u[:, t - 1] - u[:, t - 2]
    return u


def make_chebyshev_vandermonde(pts, deg):
    n = pts.shape[1]
    expos = n_deg_exponents(n, deg)
    univ = [calc_univariate_chebyshev(pts[:, i], deg) for i in range(n)]
    V = np.ones((pts.shape[0], len(expos)))
    for col, xp in enumerate(expos):
        acc = univ[0][:, xp[0]].copy()
        for j in range(1, n):
            acc *= univ[j][:, xp[j]]
        V[:, col] = acc
    return V


def choose_interp_pts(cand_pts, d, get_quadr):
    """QR-Fekete selection of U points from candidates
    (`realinterp.jl:334-370`)."""
    n = cand_pts.shape[1]
    U = get_U(n, d)
    V = make_chebyshev_vandermonde(cand_pts, 2 * d)
    Q, R, piv = scipy.linalg.qr(V.T, mode="full", pivoting=True)
    keep_pts = piv[:U]
    Vkeep = V[keep_pts, :]
    w = np.zeros(0)
    if get_quadr:
        m = np.zeros(V.shape[1])
        for col, xp in enumerate(n_deg_exponents(n, 2 * d)):
            if all(e % 2 == 0 for e in xp):
                m[col] = np.prod([2.0 / (1 - e**2) for e in xp])
        Qtm = Q.T @ m
        w = scipy.linalg.solve_triangular(R[:U, :U], Qtm[:U], lower=False)
    return Vkeep, keep_pts, w


def make_wsos_arrays(dom, cand_pts, d, get_quadr):
    n = cand_pts.shape[1]
    V, keep_pts, w = choose_interp_pts(cand_pts, d, get_quadr)
    pts = cand_pts[keep_pts, :]
    P0 = V[:, :get_L(n, d)]
    Lsub = get_L(n, (2 * d - dom.degree()) // 2)
    P0sub = P0[:, :Lsub]
    return pts, P0, P0sub, V, w


def interp_sample(dom, d, get_quadr, sample_factor, rng):
    U = get_U(dom.dimension(), d)
    cand_pts = dom.sample(U * sample_factor, rng)
    pts, P0, P0sub, V, w = make_wsos_arrays(dom, cand_pts, d, get_quadr)
    g = dom.weights(pts)
    Ps = [P0] + [np.sqrt(gi)[:, None] * P0sub for gi in g]
    return U, pts, Ps, V, w


def _interp_box_core(n, d, calc_V, get_quadr, rng):
    from hypatia_tpu.polyutils.domains import BoxDomain

    if n == 1:
        U = get_U(1, d)
        L = get_L(1, d)
        pts = cheb2_pts(U).reshape(-1, 1)
        if calc_V:
            V = make_chebyshev_vandermonde(pts, 2 * d)
            P0 = V[:, :L]
        else:
            V = np.zeros((0, 0))
            P0 = make_chebyshev_vandermonde(pts, d)
        P0sub = P0[:, :get_L(1, d - 1)]
        w = _clenshaw_curtis_weights(U) if get_quadr else np.zeros(0)
        return U, pts, P0, P0sub, V, w
    if n == 2:
        return _padua_data(d, calc_V, get_quadr)
    # n > 2: approximate Fekete from a tensor Chebyshev candidate grid
    npts = int(np.prod([2 * d + 1 + j for j in range(1, n + 1)]))
    cand_pts = np.zeros((npts, n))
    for j in range(1, n + 1):
        ig = int(np.prod([2 * d + 1 + jj for jj in range(j + 1, n + 1)])) \
            if j < n else 1
        cs = cheb2_pts(2 * d + j)
        i = 0
        l = 0
        while i < npts:
            cand_pts[i:i + ig, j - 1] = cs[l]
            i += ig
            l += 1
            if l >= 2 * d + j:
                l = 0
    dom = BoxDomain(-np.ones(n), np.ones(n))
    pts, P0, P0sub, V, w = make_wsos_arrays(dom, cand_pts, d, get_quadr)
    return pts.shape[0], pts, P0, P0sub, V, w


def _padua_data(d, calc_V, get_quadr):
    """Padua points for bivariate degree-2d interpolation with their
    cubature weights (`realinterp.jl:208-275`): the unique explicit
    unisolvent point family on the square with minimal growth of the
    Lebesgue constant; exact quadrature rule on the Chebyshev subgrids."""
    U = get_U(2, d)
    L = get_L(2, d)
    cheba = cheb2_pts(2 * d + 1)
    chebb = cheb2_pts(2 * d + 2)
    pts = np.zeros((U, 2))
    j = 0
    for a in range(2 * d + 1):
        for b in range(2 * d + 2):
            if (a + b) % 2 == 0:
                pts[j, 0] = -cheba[a]
                pts[U - 1 - j, 1] = -chebb[2 * d + 1 - b]
                j += 1

    if calc_V:
        V = make_chebyshev_vandermonde(pts, 2 * d)
        P0 = V[:, :L]
    else:
        V = np.zeros((0, 0))
        P0 = make_chebyshev_vandermonde(pts, d)
    P0sub = P0[:, :get_L(2, d - 1)]

    if get_quadr:
        # even-degree Chebyshev evaluations on the two Chebyshev subgrids
        ie = np.arange(0, 2 * d + 1, 2)
        je1 = np.arange(0, 2 * d + 1, 2)
        jo1 = np.arange(1, 2 * d + 1, 2)
        je2 = np.arange(0, 2 * d + 2, 2)
        jo2 = np.arange(1, 2 * d + 2, 2)
        te1 = np.cos(np.pi * np.outer(ie, je1) / (2 * d))
        to1 = np.cos(np.pi * np.outer(ie, jo1) / (2 * d))
        te2 = np.cos(np.pi * np.outer(ie, je2) / (2 * d + 1))
        to2 = np.cos(np.pi * np.outer(ie, jo2) / (2 * d + 1))
        rt2 = np.sqrt(2.0)
        for M in (te1, to1, te2, to2):
            M[1:d + 1, :] *= rt2
        # even-even Chebyshev moments matrix
        mom = 2 * rt2 / (1.0 - np.arange(0, 2 * d + 1, 2) ** 2)
        mom[0] = 2.0
        Mmom = np.zeros((d + 1, d + 1))
        f = 1.0 / (d * (2 * d + 1))
        for jj in range(d + 1):
            for ii in range(d + 1 - jj):
                Mmom[ii, jj] = mom[ii] * mom[jj] * f
        Mmom[0, d] /= 2
        # cubature weights as matrices on the subgrids
        W = np.zeros((d + 1, 2 * d + 1))
        W[:, 0::2] = to2.T @ Mmom @ te1
        W[:, 1::2] = te2.T @ Mmom @ to1
        W[:, [0, 2 * d]] /= 2
        W[0, 1::2] /= 2
        W[d, 0::2] /= 2
        w = W.flatten(order="F")
    else:
        w = np.zeros(0)
    return U, pts, P0, P0sub, V, w


def _clenshaw_curtis_weights(U):
    """Clenshaw-Curtis quadrature weights at U cheb2 points on [-1,1]
    (Trefethen's clencurt; same rule as `realinterp.jl:190-201`)."""
    n = U - 1
    theta = np.pi * np.arange(1, n) / n
    v = np.ones(n - 1)
    for k in range(1, n // 2 + 1):
        factor = 1.0 if 2 * k == n else 2.0
        v -= factor * np.cos(2 * k * theta) / (4 * k * k - 1)
    w = np.zeros(U)
    w[1:-1] = 2 * v / n
    w[0] = w[-1] = 1.0 / (n * n - 1 + (n % 2))
    return w


def interp_box(dom, n, d, calc_V, get_quadr, rng):
    from hypatia_tpu.polyutils.domains import BoxDomain, FreeDomain

    U, pts, P0, P0sub, V, w = _interp_box_core(n, d, calc_V, get_quadr, rng)
    if isinstance(dom, FreeDomain):
        return U, pts, [P0], V, w
    # BoxDomain: scale/shift points, weight matrices
    pscale = 0.5 * (dom.u - dom.l)
    pshift = 0.5 * (dom.u + dom.l)
    Ps = [P0]
    for j in range(n):
        wts = np.sqrt(1 - pts[:, j] ** 2) * pscale[j]
        Ps.append(wts[:, None] * P0sub)
    trpts = pts * pscale[None, :] + pshift[None, :]
    return U, trpts, Ps, V, w


def interpolate(dom, d, calc_V=False, get_quadr=False, sample=None,
                sample_factor=0, seed=1):
    """Compute interpolation data (U, pts, Ps, V, w) for a WSOS constraint
    on a domain (`realinterp.jl:11-46`)."""
    from hypatia_tpu.polyutils.domains import BoxDomain

    assert d >= 1
    rng = np.random.default_rng(seed)
    n = dom.dimension()
    U = get_U(n, d)

    if sample is None:
        from hypatia_tpu.polyutils.domains import FreeDomain

        prod_consec = int(np.prod([2 * d + 1 + j for j in range(1, n + 1)]))
        sample = (not isinstance(dom, (BoxDomain, FreeDomain))) or n >= 7 \
            or prod_consec > 35_000

    if sample:
        if sample_factor <= 0:
            sample_factor = 10 if U <= 12_000 else (
                5 if U <= 15_000 else (2 if U <= 22_000 else 1))
        return interp_sample(dom, d, get_quadr, sample_factor, rng)
    return interp_box(dom, n, d, calc_V, get_quadr, rng)
