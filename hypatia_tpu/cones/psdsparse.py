"""Sparse positive semidefinite cone.

`PosSemidefTriSparse(side, row_idxs, col_idxs)`: real symmetric (or complex
Hermitian) matrices with a fixed sparse lower-triangle pattern (all diagonal
entries present) that are PSD with zero fill; svec scaling on off-diagonal
entries. nu = side.

Parity: `src/Cones/possemideftrisparse/` — this implements the dense-impl
semantics (`denseimpl.jl`: scatter into the full matrix, Cholesky, project
the inverse onto the pattern). The reference's supernodal CHOLMOD
implementation (`cholmodimpl.jl`) is a CPU-sparse optimization of the same
oracles; on TPU the dense scatter path is the natural layout (the reference
keeps dense as the always-available fallback, `possemideftrisparse.jl:110-122`).

Indices here are 0-based (the reference is 1-based Julia).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone


class PosSemidefTriSparse(Cone):
    def __init__(self, side, row_idxs, col_idxs, is_complex=False,
                 use_dual=False):
        row_idxs = np.asarray(row_idxs, dtype=int)
        col_idxs = np.asarray(col_idxs, dtype=int)
        assert row_idxs.shape == col_idxs.shape
        assert np.all(row_idxs >= col_idxs), "lower-triangle indices required"
        diag_mask = row_idxs == col_idxs
        assert np.sum(diag_mask) == side, "all diagonal entries required"
        self.side = side
        self.row_idxs = row_idxs
        self.col_idxs = col_idxs
        self.is_complex = bool(is_complex)
        if is_complex:
            dim = int(np.sum(diag_mask) + 2 * np.sum(~diag_mask))
        else:
            dim = len(row_idxs)
        super().__init__(dim, use_dual)
        # precompute svec slot -> (kind, row, col); kind 0 diag, 1 re, 2 im
        kinds, rows, cols = [], [], []
        for r, c in zip(row_idxs, col_idxs):
            if r == c:
                kinds.append(0), rows.append(r), cols.append(c)
            else:
                kinds.append(1), rows.append(r), cols.append(c)
                if is_complex:
                    kinds.append(2), rows.append(r), cols.append(c)
        self._kinds = np.asarray(kinds)
        self._rows = np.asarray(rows)
        self._cols = np.asarray(cols)

    def params_key(self):
        return (self.side, self.row_idxs.tobytes(), self.col_idxs.tobytes(),
                self.is_complex)

    @property
    def nu(self):
        return self.side

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[self._kinds == 0] = 1.0
        return pt

    def _mat(self, s):
        irt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=jnp.float64))
        weights = jnp.where(self._kinds == 0, 1.0, irt2)
        vals = s * weights
        dtype = jnp.complex128 if self.is_complex else jnp.float64
        M = jnp.zeros((self.side, self.side), dtype=dtype)
        if self.is_complex:
            re = jnp.where(self._kinds != 2, vals, 0.0)
            im = jnp.where(self._kinds == 2, vals, 0.0)
            M = M.at[self._rows, self._cols].add(re - 1j * im)
            offd = self._kinds != 0
            M = M.at[self._cols[offd], self._rows[offd]].add(
                re[offd] + 1j * im[offd])
        else:
            M = M.at[self._rows, self._cols].add(vals)
            offd = self._kinds != 0
            M = M.at[self._cols[offd], self._rows[offd]].add(vals[offd])
        return M

    def barrier(self, s):
        L = jnp.linalg.cholesky(self._mat(s))
        return -2 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(L))))

    def feas(self, s):
        L = jnp.linalg.cholesky(self._mat(s))
        return jnp.all(jnp.isfinite(jnp.real(L)))
