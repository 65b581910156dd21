"""D-optimal experiment design: choose trial counts np maximizing a
log-det / root-det criterion of V diag(np) V'.

Parity: `examples/doptimaldesign/native.jl` (logdet and rootdet natural
formulations; vars (t, np) with hypograph variable t).
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import smat_to_svec_np, svec_length


def build(q: int, p: int, n: int, n_max: int, use_logdet: bool = True,
          seed: int = 1):
    assert p > q and n > q and n_max <= n
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((q, p))

    # bounds on trial counts via two nonnegative cones: 0 <= np <= n_max
    G_bound = np.vstack([-np.eye(p), np.eye(p)])
    h_bound = np.concatenate([np.zeros(p), np.full(p, float(n_max))])
    cone_list = [cones.Nonnegative(p), cones.Nonnegative(p)]

    A = np.ones((1, p))
    b = np.array([float(n)])

    # hypograph variable t: vars (t, np)
    c = np.concatenate([[-1.0], np.zeros(p)])
    A = np.hstack([np.zeros((1, 1)), A])
    G_bound = np.hstack([np.zeros((2 * p, 1)), G_bound])

    # svec rows of -V diag(np) V'
    dimvec = svec_length(q)
    G_det = np.zeros((dimvec, p))
    for k in range(p):
        M = -np.outer(V[:, k], V[:, k])
        G_det[:, k] = smat_to_svec_np(M)

    if use_logdet:
        cone_list.append(cones.HypoPerLogdetTri(dimvec + 2))
        h_det = np.concatenate([[0.0, 1.0], np.zeros(dimvec)])
        G_det = np.vstack([
            np.concatenate([[-1.0], np.zeros(p)])[None, :],
            np.zeros((1, p + 1)),
            np.hstack([np.zeros((dimvec, 1)), G_det]),
        ])
    else:
        cone_list.append(cones.HypoRootdetTri(dimvec + 1))
        h_det = np.zeros(dimvec + 1)
        G_det = np.vstack([
            np.concatenate([[-1.0], np.zeros(p)])[None, :],
            np.hstack([np.zeros((dimvec, 1)), G_det]),
        ])

    G = np.vstack([G_bound, G_det])
    h = np.concatenate([h_bound, h_det])
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(q=2, p=4, n=6, n_max=3, use_logdet=True),
           dict(q=2, p=4, n=6, n_max=3, use_logdet=False)]
FAST = [dict(q=4, p=8, n=12, n_max=6, use_logdet=True),
        dict(q=4, p=8, n=12, n_max=6, use_logdet=False)]
BENCH = [dict(q=25, p=75, n=150, n_max=10, use_logdet=True),
         dict(q=25, p=75, n=150, n_max=10, use_logdet=False)]
