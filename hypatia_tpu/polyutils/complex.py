"""Complex polynomial interpolation for Hermitian WSOS cones.

Monomial basis z^a conj(z)^b of total degree <= halfdeg each; U = L^2 real
interpolation conditions; QR-based point selection from box samples
filtered by the domain inequalities g_i(z) > 0.

Parity: `src/PolyUtils/complex.jl:13-72`.
"""

import math

import numpy as np
import scipy.linalg

from hypatia_tpu.polyutils.interp import _compositions


def interpolate_complex(n, halfdeg, gs=(), g_halfdegs=(), sample_factor=10,
                        use_qr=False, seed=1):
    """Returns (points, Ps): complex sample points (list of C^n vectors) and
    interpolant-basis matrices for WSOSInterpNonnegative over C."""
    rng = np.random.default_rng(seed)
    L = math.comb(n + halfdeg, n)
    U = L * L
    L_basis = [xp for t in range(halfdeg + 1)
               for xp in _compositions(n, t)]
    assert len(L_basis) == L

    def mon_pow(z, ex):
        out = 1.0 + 0j
        for zi, e in zip(z, ex):
            out *= zi**e
        return out

    # rejection-sample the unit box in C^n subject to g_i(z) > 0
    num_samples = sample_factor * U
    samples = []
    while len(samples) < num_samples:
        z = (2 * rng.random(n) - 1) + 1j * (2 * rng.random(n) - 1)
        if all(g(z) > 0 for g in gs):
            samples.append(z)

    V = np.zeros((num_samples, U), dtype=complex)
    col = 0
    for l_ex in L_basis:
        for k_ex in L_basis:
            for i, z in enumerate(samples):
                V[i, col] = mon_pow(z, k_ex) * mon_pow(np.conj(z), l_ex)
            col += 1

    _, _, piv = scipy.linalg.qr(V.T, mode="economic", pivoting=True)
    keep = piv[:U]
    points = [samples[i] for i in keep]
    V = V[keep, :]

    P0 = V[:, :L]
    if use_qr:
        P0 = np.linalg.qr(P0)[0]
    Ps = [P0]
    for g, g_halfdeg in zip(gs, g_halfdegs):
        gvals = np.array([g(z) for z in points], dtype=float)
        Lsub = math.comb(n + halfdeg - g_halfdeg, n)
        Pi = np.sqrt(gvals)[:, None] * P0[:, :Lsub]
        if use_qr:
            Pi = np.linalg.qr(Pi)[0]
        Ps.append(Pi)
    return points, Ps
