"""Strengthened theta function bound on the stability number of a graph.

max 2*sum(X) - sum(diag X)  s.t.  tr(X) = 1, X (supported on the
complement-graph pattern) doubly nonnegative — or PSD + elementwise
nonneg split. Parity: `examples/stabilitynumber/JuMP.jl`.
"""

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import svec_length

RT2 = np.sqrt(2.0)


def _slot(i, j):
    """svec slot (column-major upper triangle) for matrix entry (i, j)."""
    lo, hi = min(i, j), max(i, j)
    return hi * (hi + 1) // 2 + lo


def build(side: int = 2, use_doublynonnegativetri: bool = True,
          seed: int = 1):
    rng = np.random.default_rng(seed)
    density = 1.0 - 1.0 / side
    rows, cols = [], []
    for i in range(side):
        rows.append(i)
        cols.append(i)
        for j in range(i):
            if rng.random() < density:
                rows.append(i)
                cols.append(j)
    K = len(rows)
    diag = np.asarray([r == c for r, c in zip(rows, cols)])

    # max 2 sum(X) - sum(diag) => min sum over entries of -(2 - is_diag)
    c = np.where(diag, -1.0, -2.0)
    A = diag.astype(float)[None, :]
    b = np.array([1.0])

    sdim = svec_length(side)
    G_psd = np.zeros((sdim, K))
    for k, (i, j) in enumerate(zip(rows, cols)):
        G_psd[_slot(i, j), k] = -(1.0 if i == j else RT2)

    if use_doublynonnegativetri:
        G = G_psd
        h = np.zeros(sdim)
        cone_list = [cones.DoublyNonnegativeTri(sdim)]
    else:
        off = np.where(~diag)[0]
        G_nn = np.zeros((len(off), K))
        G_nn[np.arange(len(off)), off] = -1.0
        G = np.vstack([G_psd, G_nn])
        h = np.zeros(sdim + len(off))
        cone_list = [cones.PosSemidefTri(sdim)]
        if len(off):
            cone_list.append(cones.Nonnegative(len(off)))

    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(side=2, use_doublynonnegativetri=True),
           dict(side=2, use_doublynonnegativetri=False)]
FAST = [dict(side=20, use_doublynonnegativetri=True),
        dict(side=20, use_doublynonnegativetri=False)]
BENCH = [dict(side=40, use_doublynonnegativetri=True)]
