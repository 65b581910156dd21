"""Portfolio optimization: maximize expected returns under risk-ball
constraints.

Parity: `examples/portfolio/native.jl` (epinormeucl / epinorminf variants).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(num_stocks: int, epinormeucl_constr: bool = True,
          epinorminf_constrs: bool = False, use_epinorminf: bool = True,
          seed: int = 1):
    assert epinormeucl_constr != epinorminf_constrs
    rng = np.random.default_rng(seed)
    n = num_stocks
    returns = rng.random(n)
    sigma_half = rng.standard_normal((n, n))
    x = rng.standard_normal(n)
    x /= np.linalg.norm(x)
    gamma = np.abs(sigma_half @ x).sum() / np.sqrt(n)

    c = -returns
    A = np.ones((1, n))
    b = np.array([1.0])
    G_blocks = [-np.eye(n)]
    h_blocks = [np.zeros(n)]
    cone_list = [cones.Nonnegative(n)]

    def add_ball(cone, gamma_new):
        G_blocks.append(np.vstack([np.zeros((1, n)), -sigma_half]))
        h_blocks.append(np.concatenate([[gamma_new], np.zeros(n)]))
        cone_list.append(cone)

    if epinormeucl_constr:
        add_ball(cones.EpiNormEucl(n + 1), gamma)
    if epinorminf_constrs:
        assert use_epinorminf, "nonnegative-formulation variant not ported"
        add_ball(cones.EpiNormInf(n + 1, use_dual=True),
                 gamma * np.sqrt(n))
        add_ball(cones.EpiNormInf(n + 1), gamma)

    G = np.vstack(G_blocks)
    h = np.concatenate(h_blocks)
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(num_stocks=4),
           dict(num_stocks=4, epinormeucl_constr=False,
                epinorminf_constrs=True)]
FAST = [dict(num_stocks=20), dict(num_stocks=50)]
BENCH = [dict(num_stocks=200), dict(num_stocks=400)]
