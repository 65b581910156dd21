"""Shape-constrained polynomial regression.

min_p loss(p(X_i) - y_i)  s.t.  dp/dx_j >= 0 on the box (monotonicity)
and Hessian(p) WSOS-PSD on the box (convexity). The regressor is
parameterized in the monomial basis (same polynomial space as the
reference's interpolant-basis regressor), making the derivative maps
closed-form. Parity: `examples/shapeconregr/JuMP.jl` (WSOS
formulation; PSD Gram formulation not ported).
"""

import itertools

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.polyutils import BoxDomain, interpolate

RT2 = np.sqrt(2.0)

FUNCS = {
    "func1": lambda X: np.sum(X**2, 1),
    "func2": lambda X: np.sum(X**3, 1),
    "func3": lambda X: np.sum(X**4, 1),
    "func4": lambda X: np.exp(np.sum(X**2, 1) / X.shape[1]) - 1,
    "func6": lambda X: np.sum((X + 1)**4, 1),
    "func7": lambda X: np.sum((X / 2 + 1)**3, 1),
}


def _monomials(n, maxdeg):
    out = []
    for deg in range(maxdeg + 1):
        for combo in itertools.combinations_with_replacement(range(n), deg):
            e = [0] * n
            for v in combo:
                e[v] += 1
            out.append(tuple(e))
    return out


def _mono_vander(pts, monos):
    V = np.ones((pts.shape[0], len(monos)))
    for c, e in enumerate(monos):
        for i, p in enumerate(e):
            if p:
                V[:, c] *= pts[:, i]**p
    return V


def _mono_vander_d1(pts, monos, j):
    """d/dx_j of each monomial, evaluated at pts."""
    V = np.zeros((pts.shape[0], len(monos)))
    for c, e in enumerate(monos):
        if e[j] == 0:
            continue
        col = float(e[j]) * np.ones(pts.shape[0])
        for i, p in enumerate(e):
            q = p - 1 if i == j else p
            if q:
                col = col * pts[:, i]**q
        V[:, c] = col
    return V


def _mono_vander_d2(pts, monos, i, j):
    """d2/dx_i dx_j of each monomial, evaluated at pts."""
    V = np.zeros((pts.shape[0], len(monos)))
    for c, e in enumerate(monos):
        ei = list(e)
        coef = 1.0
        for ax in ((i, j) if i != j else (i, i)):
            if ei[ax] == 0:
                coef = 0.0
                break
            coef *= ei[ax]
            ei[ax] -= 1
        if coef == 0.0:
            continue
        col = coef * np.ones(pts.shape[0])
        for ax, p in enumerate(ei):
            if p:
                col = col * pts[:, ax]**p
        V[:, c] = col
    return V


def build(n: int = 2, num_points: int = 5, func: str = "func2",
          signal_ratio: float = 2.0, deg: int = 4,
          use_L1_obj: bool = False, use_monotonicity: bool = True,
          use_convexity: bool = False, seed: int = 1):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1.0, 1.0, size=(num_points, n))
    y = FUNCS[func](X)
    if signal_ratio > 0:
        noise = rng.standard_normal(num_points)
        noise *= np.linalg.norm(y) / np.sqrt(signal_ratio) \
            / max(np.linalg.norm(noise), 1e-12)
        y = y + noise

    halfdeg = (deg + 1) // 2
    monos = _monomials(n, 2 * halfdeg)
    U = len(monos)
    MX = _mono_vander(X, monos)

    # vars: (theta (U), z)
    nv = U + 1
    c = np.zeros(nv)
    c[U] = 1.0
    A = np.zeros((0, nv))
    b = np.zeros(0)
    G_rows, h_rows, cone_list = [], [], []

    # objective epigraph (z, y - MX theta)
    Go = np.zeros((1 + num_points, nv))
    Go[0, U] = -1.0
    Go[1:, :U] = MX
    G_rows.append(Go)
    h_rows.append(np.concatenate([[0.0], y]))
    if use_L1_obj:
        cone_list.append(cones.EpiNormInf(1 + num_points, use_dual=True))
    else:
        cone_list.append(cones.EpiNormEucl(1 + num_points))

    box = BoxDomain(-np.ones(n), np.ones(n))
    if use_monotonicity:
        g_halfdeg = max(deg // 2, 1)
        gU, gpts, gPs, _, _ = interpolate(box, g_halfdeg, seed=seed)
        gpts = np.asarray(gpts)
        for j in range(n):
            Dj = _mono_vander_d1(gpts, monos, j)
            Gm = np.zeros((gU, nv))
            Gm[:, :U] = -Dj
            G_rows.append(Gm)
            h_rows.append(np.zeros(gU))
            cone_list.append(cones.WSOSInterpNonnegative(gU, gPs))

    if use_convexity:
        h_halfdeg = max((deg - 1) // 2, 1)
        hU, hpts, hPs, _, _ = interpolate(box, h_halfdeg, seed=seed)
        hpts = np.asarray(hpts)
        sdim = n * (n + 1) // 2
        Gh = np.zeros((sdim * hU, nv))
        s = 0
        for jcol in range(n):
            for irow in range(jcol + 1):
                scale = 1.0 if irow == jcol else RT2
                Dij = _mono_vander_d2(hpts, monos, irow, jcol)
                Gh[s * hU:(s + 1) * hU, :U] = -scale * Dij
                s += 1
        G_rows.append(Gh)
        h_rows.append(np.zeros(sdim * hU))
        cone_list.append(cones.WSOSInterpPosSemidefTri(n, hU, hPs))

    return Model(c, A, b, np.vstack(G_rows), np.concatenate(h_rows),
                 cone_list)


MINIMAL = [dict(n=2, num_points=5, func="func2", signal_ratio=2.0, deg=4,
                use_monotonicity=True, use_convexity=False),
           dict(n=1, num_points=5, func="func6", signal_ratio=2.0, deg=4,
                use_monotonicity=True, use_convexity=True),
           dict(n=1, num_points=5, func="func4", signal_ratio=2.0, deg=4,
                use_monotonicity=False, use_convexity=True)]
FAST = [dict(n=2, num_points=40, func="func3", signal_ratio=10.0, deg=4,
             use_monotonicity=True, use_convexity=True),
        dict(n=2, num_points=40, func="func7", signal_ratio=10.0, deg=4,
             use_L1_obj=True, use_monotonicity=True, use_convexity=False)]
BENCH = [dict(n=3, num_points=150, func="func3", signal_ratio=10.0, deg=6,
              use_monotonicity=True, use_convexity=True)]
