"""Matrix completion: minimize spectral or nuclear norm of a matrix with
some entries fixed.

min ||X||_{spec or nuc}  s.t.  X_ij = v_ij for known (i, j).
Parity: `examples/matrixcompletion/native.jl` (epinormspectral natural
formulation; the PSD extended formulation is the reference's comparison).
"""

import numpy as np

from hypatia_tpu import Model, cones


def build(m: int, n: int, nuclearnorm_obj: bool = False, seed: int = 1):
    assert m <= n
    rng = np.random.default_rng(seed)
    mn = m * n
    num_known = round(mn * 0.8)
    known_idx = rng.choice(mn, num_known, replace=False)
    known_vals = 2 * rng.random(num_known) - 1

    unknown_idx = np.setdiff1d(np.arange(mn), known_idx)
    nu_vars = unknown_idx.size
    # vars (t, x_unknown); s = (t, vec X) in EpiNormSpectral(.., use_dual)
    c = np.concatenate([[1.0], np.zeros(nu_vars)])
    G = np.zeros((1 + mn, 1 + nu_vars))
    G[0, 0] = -1.0
    h = np.zeros(1 + mn)
    h[1 + known_idx] = known_vals
    for k, idx in enumerate(unknown_idx):
        G[1 + idx, 1 + k] = -1.0
    cone = cones.EpiNormSpectral(m, n, use_dual=nuclearnorm_obj)
    return Model(c, np.zeros((0, 1 + nu_vars)), np.zeros(0), G, h, [cone])


MINIMAL = [dict(m=2, n=3), dict(m=2, n=3, nuclearnorm_obj=True)]
FAST = [dict(m=5, n=8), dict(m=5, n=8, nuclearnorm_obj=True)]
BENCH = [dict(m=30, n=50)]
