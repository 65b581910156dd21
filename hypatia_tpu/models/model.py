"""Conic model container.

Primal conic form (reference `src/Models/Models.jl:14-68`,
`docs/src/modeling.md:7-29`):

    min c'x   s.t.  b - A x = 0,   h - G x in K

with K a Cartesian product of cones. Data is held as NumPy float arrays on
host (the solver moves what it needs to device); A and G may be dense arrays
(sparse inputs are densified — the TPU compute path is dense/batched).
"""

import numpy as np

from hypatia_tpu.cones.base import Cone


def _to_dense(M, shape, dtype):
    if M is None:
        return np.zeros(shape, dtype=dtype)
    if hasattr(M, "toarray"):  # scipy sparse
        M = M.toarray()
    M = np.asarray(M, dtype=dtype)
    assert M.shape == shape, f"expected {shape}, got {M.shape}"
    return M


class Model:
    """Conic model. n = len(c), p = len(b), q = len(h)."""

    def __init__(self, c, A, b, G, h, cones, obj_offset=0.0, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        self.c = np.asarray(c, dtype=self.dtype).reshape(-1)
        self.b = np.asarray(b, dtype=self.dtype).reshape(-1)
        self.h = np.asarray(h, dtype=self.dtype).reshape(-1)
        self.n = self.c.size
        self.p = self.b.size
        self.q = self.h.size
        self.A = _to_dense(A, (self.p, self.n), self.dtype)
        self.G = _to_dense(G, (self.q, self.n), self.dtype)
        self.obj_offset = float(obj_offset)
        self.cones = list(cones)
        for cone in self.cones:
            assert isinstance(cone, Cone)
        self.cone_idxs = build_cone_idxs(self.q, self.cones)
        self.nu = float(sum(cone.nu for cone in self.cones))

    def copy(self):
        return Model(
            self.c.copy(), self.A.copy(), self.b.copy(), self.G.copy(),
            self.h.copy(), self.cones, obj_offset=self.obj_offset,
            dtype=self.dtype,
        )


def build_cone_idxs(q, cones):
    """Contiguous (start, dim) per cone (`Models.jl:56-66`)."""
    idxs = []
    offset = 0
    for cone in cones:
        idxs.append((offset, cone.dim))
        offset += cone.dim
    assert offset == q, f"cone dims sum to {offset}, expected q={q}"
    return idxs
