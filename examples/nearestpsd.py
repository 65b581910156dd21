"""Nearest sparse PSD / PSD-completable matrix to a given matrix.

max tr(A X)  s.t.  tr(X) = 1,  X in the sparse PSD cone (or its dual, the
PSD-completable cone) over a chordal-ish random sparsity pattern.
Parity: `examples/nearestpsd/JuMP.jl` (native re-formulation with
PosSemidefTriSparse).
"""

import numpy as np

from hypatia_tpu import Model, cones


def _random_pattern(side, rng, extra_frac=0.3):
    """Lower-triangle pattern containing all diagonal entries."""
    rows = list(range(side))
    cols = list(range(side))
    for i in range(1, side):
        for j in range(i):
            if rng.random() < extra_frac:
                rows.append(i)
                cols.append(j)
    return np.asarray(rows), np.asarray(cols)


def build(side: int = 5, use_completable: bool = False, seed: int = 1,
          impl: str = "dense", band: int = 4, block: int = None):
    rng = np.random.default_rng(seed)
    if impl == "banded":
        from hypatia_tpu.cones.psdbanded import band_pattern

        rows, cols = band_pattern(side, band)
        cone = cones.PosSemidefTriBanded(side, band, block=block,
                                         use_dual=use_completable)
    else:
        rows, cols = _random_pattern(side, rng)
        cone_cls = (cones.PosSemidefTriSparseSupernodal
                    if impl == "supernodal" else cones.PosSemidefTriSparse)
        cone = cone_cls(side, rows, cols, use_dual=use_completable)
    dim = cone.dim
    # random symmetric A restricted to the pattern, svec-scaled coords
    avals = rng.standard_normal(dim)
    # trace row: coefficients 1 at diagonal slots
    diag_mask = (cone._kinds == 0).astype(float)

    c = -avals  # max tr(A X) = <svec(A), x>
    A = diag_mask[None, :]
    b = np.array([1.0])
    G = -np.eye(dim)
    h = np.zeros(dim)
    return Model(c, A, b, G, h, [cone])


MINIMAL = [dict(side=4), dict(side=4, use_completable=True),
           dict(side=4, impl="supernodal"),
           dict(side=4, use_completable=True, impl="supernodal"),
           dict(side=5, impl="banded", band=2, block=2)]
FAST = [dict(side=15)]
BENCH = [dict(side=100), dict(side=200, impl="banded", band=4, block=16)]
