"""Discrete maximum likelihood with entropy ball prior.

max prod(p_i^freq_i)  s.t.  sum p = 1,  entropy distance of p from the
uniform prior bounded:  (1/d, 1/d, p) in vector negative-entropy cone.
Parity: `examples/discretemaxlikelihood/JuMP.jl` (native re-formulation).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(d: int, seed: int = 1):
    assert d >= 2
    rng = np.random.default_rng(seed)
    freq = rng.integers(1, 2 * d + 1, size=d).astype(float)
    freq /= freq.sum()

    # vars (hypo, p)
    n = 1 + d
    c = np.concatenate([[-1.0], np.zeros(d)])
    A = np.concatenate([[0.0], np.ones(d)])[None, :]
    b = np.array([1.0])

    # (hypo, p) in HypoPowerMean(freq)
    G1 = -np.eye(n)
    h1 = np.zeros(n)
    # (1/d, 1/d, p) in EpiPerSepSpectralVector(NegEntropy, d)
    G2 = np.zeros((2 + d, n))
    G2[2:, 1:] = -np.eye(d)
    h2 = np.concatenate([[1.0 / d, 1.0 / d], np.zeros(d)])
    G = np.vstack([G1, G2])
    h = np.concatenate([h1, h2])
    cone_list = [
        cones.HypoPowerMean(freq),
        cones.EpiPerSepSpectralVector(cones.NegEntropySSF(), d),
    ]
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(d=3)]
FAST = [dict(d=10)]
BENCH = [dict(d=200)]
