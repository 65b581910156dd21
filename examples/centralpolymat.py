"""Minimize a spectral function of a Gram matrix of a polynomial.

min_Q  f_spec(Q)  s.t.  basis' Q basis = given polynomial, with Q an
L x L symmetric Gram matrix over the degree-<=halfdeg monomial basis.
Spectral objectives: neggeom (via HypoRootdetTri), or separable
spectral (inv / negentropy / power12) via EpiPerSepSpectralMatrix.
Parity: `examples/centralpolymat/JuMP.jl` (eigord/direct extended
formulations are JuMP bridge variants, not ported).
"""

import itertools

import numpy as np

from hypatia_tpu import Model, cones

RT2 = np.sqrt(2.0)


def _monomials(m, maxdeg):
    """All exponent tuples over m vars with total degree <= maxdeg,
    graded-lex order."""
    out = []
    for deg in range(maxdeg + 1):
        for combo in itertools.combinations_with_replacement(range(m), deg):
            e = [0] * m
            for v in combo:
                e[v] += 1
            out.append(tuple(e))
    return out


def _slot(i, j):
    lo, hi = min(i, j), max(i, j)
    return hi * (hi + 1) // 2 + lo


def build(m: int = 2, halfdeg: int = 2, ext: str = "neggeom",
          seed: int = 1):
    rng = np.random.default_rng(seed)
    basis = _monomials(m, halfdeg)
    L = len(basis)
    sL = L * (L + 1) // 2

    Q0 = rng.standard_normal((L, L))
    Q0 = Q0.T @ Q0          # positive domain
    Q0 /= np.max(np.linalg.eigvalsh(Q0))

    # coefficient-matching rows: one per distinct monomial product
    prods = _monomials(m, 2 * halfdeg)
    prod_idx = {e: r for r, e in enumerate(prods)}
    nP = len(prods)
    nv = sL + 1            # (svec Q, epi)
    A = np.zeros((nP, nv))
    b = np.zeros(nP)
    for k in range(L):
        for l in range(L):
            e = tuple(a + bb for a, bb in zip(basis[k], basis[l]))
            r = prod_idx[e]
            b[r] += Q0[k, l]
            if k <= l:
                A[r, _slot(k, l)] += (1.0 if k == l else RT2 / 2.0)
            else:
                A[r, _slot(l, k)] += RT2 / 2.0

    c = np.zeros(nv)
    c[sL] = 1.0            # min epi

    if ext == "neggeom":
        # epi >= -rootdet(Q): (u, svec Q) in HypoRootdetTri with u = -epi
        G = np.zeros((1 + sL, nv))
        G[0, sL] = 1.0
        G[1:, :sL] = -np.eye(sL)
        h = np.zeros(1 + sL)
        cone = cones.HypoRootdetTri(1 + sL)
    else:
        ssf = {"inv": cones.InvSSF, "negentropy": cones.NegEntropySSF,
               "power12": cones.Power12SSF, "neglog": cones.NegLogSSF}[ext]
        G = np.zeros((2 + sL, nv))
        G[0, sL] = -1.0
        G[2:, :sL] = -np.eye(sL)
        h = np.zeros(2 + sL)
        h[1] = 1.0
        cone = cones.EpiPerSepSpectralMatrix(
            ssf(1.5) if ext == "power12" else ssf(), L)
    return Model(c, A, b, G, h, [cone])


def spectral_value(lams, ext):
    """Reference objective value from the eigenvalues of Q_opt."""
    lams = np.maximum(lams, 1e-12)
    if ext == "neggeom":
        return -float(np.exp(np.mean(np.log(lams))))
    if ext == "inv":
        return float(np.sum(1.0 / lams))
    if ext == "negentropy":
        return float(np.sum(lams * np.log(lams)))
    if ext == "power12":
        return float(np.sum(lams ** 1.5))
    if ext == "neglog":
        return -float(np.sum(np.log(lams)))
    raise ValueError(ext)


MINIMAL = [dict(m=2, halfdeg=2, ext="neggeom"),
           dict(m=2, halfdeg=2, ext="inv"),
           dict(m=1, halfdeg=2, ext="negentropy")]
FAST = [dict(m=2, halfdeg=3, ext="neggeom"),
        dict(m=3, halfdeg=2, ext="inv"),
        dict(m=2, halfdeg=2, ext="power12"),
        dict(m=2, halfdeg=2, ext="neglog")]
BENCH = [dict(m=3, halfdeg=3, ext="neggeom")]
