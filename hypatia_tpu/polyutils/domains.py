"""Real polynomial interpolation domains.

Parity: `src/PolyUtils/realdomains.jl` (FreeDomain, BoxDomain, BallDomain,
EllipsoidDomain). `sample` draws candidate points, `weights` evaluates the
domain-defining polynomial inequalities g_i at points (used to build the
weighted P matrices sqrt(g_i) .* P0sub).
"""

import numpy as np
import scipy.linalg
import scipy.special


class Domain:
    def dimension(self):
        raise NotImplementedError

    def degree(self):
        raise NotImplementedError

    def sample(self, npts, rng):
        raise NotImplementedError

    def weights(self, pts):
        raise NotImplementedError


class FreeDomain(Domain):
    def __init__(self, n: int):
        assert n >= 1
        self.n = n

    def dimension(self):
        return self.n

    def degree(self):
        return 0

    def sample(self, npts, rng):
        return BoxDomain(-np.ones(self.n), np.ones(self.n)).sample(npts, rng)

    def weights(self, pts):
        return []


class BoxDomain(Domain):
    def __init__(self, l, u):
        self.l = np.asarray(l, dtype=float)
        self.u = np.asarray(u, dtype=float)
        assert self.l.shape == self.u.shape

    def dimension(self):
        return self.l.size

    def degree(self):
        return 2

    def sample(self, npts, rng):
        dim = self.dimension()
        pts = rng.random((npts, dim)) - 0.5
        return pts * (self.u - self.l)[None, :] + ((self.u + self.l) / 2)[None, :]

    def weights(self, pts):
        return [(pts[:, i] - self.l[i]) * (self.u[i] - pts[:, i])
                for i in range(self.dimension())]


def _ball_sample(dim, npts, rng):
    pts = rng.standard_normal((npts, dim))
    norms = np.sum(pts**2, axis=1)
    pts /= np.sqrt(norms)[:, None]
    norms /= 2
    # incomplete gamma inverse-cdf radial scaling (`realdomains.jl:103-111`)
    gammainc = scipy.special.gammainc(dim / 2, norms)
    pts *= gammainc[:, None] ** (1.0 / dim)
    return pts


class BallDomain(Domain):
    def __init__(self, c, r):
        self.c = np.asarray(c, dtype=float)
        self.r = float(r)
        assert self.r > 0

    def dimension(self):
        return self.c.size

    def degree(self):
        return 2

    def sample(self, npts, rng):
        pts = _ball_sample(self.dimension(), npts, rng)
        return pts * self.r + self.c[None, :]

    def weights(self, pts):
        g = self.r**2 - np.sum((pts - self.c[None, :]) ** 2, axis=1)
        assert np.all(g >= 0)
        return [g]


class EllipsoidDomain(Domain):
    """(x-c)' Q (x-c) <= 1 with Q SPD."""

    def __init__(self, c, Q):
        self.c = np.asarray(c, dtype=float)
        self.Q = np.asarray(Q, dtype=float)
        self.QU = scipy.linalg.cholesky(self.Q, lower=False)

    def dimension(self):
        return self.c.size

    def degree(self):
        return 2

    def sample(self, npts, rng):
        pts = _ball_sample(self.dimension(), npts, rng)
        # map unit ball through Q^(-1/2)
        pts = scipy.linalg.solve_triangular(self.QU, pts.T, lower=False).T
        return pts + self.c[None, :]

    def weights(self, pts):
        diff = pts - self.c[None, :]
        g = 1.0 - np.einsum("ij,jk,ik->i", diff, self.Q, diff)
        assert np.all(g >= -1e-12)
        return [np.maximum(g, 0.0)]
