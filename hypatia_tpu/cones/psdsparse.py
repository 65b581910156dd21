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
from hypatia_tpu.ops import linalg


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
        # Precompute every derived index/mask/weight array ONCE and reuse
        # the SAME objects at every traced call site: jax dedups closure
        # constants by object identity, so re-deriving (e.g. `kinds == 0`)
        # per oracle call embedded a fresh O(dim) constant each time —
        # ~540 copies and 4 of the 5.1 MB in the nearestpsd side-100
        # program (the compile-helper OOM of BASELINE.md r4).
        irt2 = 1.0 / np.sqrt(2.0)
        self._diag = self._kinds == 0
        self._im = self._kinds == 2
        self._not_im = self._kinds != 2
        self._offd = self._kinds != 0
        self._rows_o = self._rows[self._offd]
        self._cols_o = self._cols[self._offd]
        self._w_unpack = np.where(self._diag, 1.0, irt2)
        self._w_pack = np.where(self._diag, 1.0, np.sqrt(2.0))
        self._rows_col = self._rows[:, None]
        self._cols_col = self._cols[:, None]
        self._rows_row = self._rows[None, :]
        self._cols_row = self._cols[None, :]
        self._w_hess = np.where(self._diag, irt2, 1.0)
        self._w_hess_col = self._w_hess[:, None]
        self._w_hess_row = self._w_hess[None, :]
        self._const_cache = {}

    def _const(self, name, dtype):
        """dtype-cast view of a precomputed numpy constant, cached so every
        traced call site reuses the SAME object (np.astype copies, and a
        fresh object per call defeats jax's identity-based constant dedup)."""
        key = (name, np.dtype(dtype).name)
        if key not in self._const_cache:
            self._const_cache[key] = getattr(self, name).astype(dtype)
        return self._const_cache[key]

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
        vals = s * self._const('_w_unpack', s.dtype)
        dtype = (jnp.complex64 if s.dtype == jnp.float32 else
                 jnp.complex128) if self.is_complex else s.dtype
        M = jnp.zeros((self.side, self.side), dtype=dtype)
        if self.is_complex:
            re = jnp.where(self._not_im, vals, 0.0)
            im = jnp.where(self._im, vals, 0.0)
            M = M.at[self._rows, self._cols].add(re - 1j * im)
            offd = self._offd
            M = M.at[self._cols_o, self._rows_o].add(
                re[offd] + 1j * im[offd])
        else:
            M = M.at[self._rows, self._cols].add(vals)
            M = M.at[self._cols_o, self._rows_o].add(vals[self._offd])
        return M

    def _pack(self, M):
        """Adjoint of `_mat`: project a symmetric/Hermitian matrix onto the
        pattern coordinates with the svec scaling (so that
        <pack(M), s> = <M, mat(s)> for all s)."""
        vals_rc = M[self._rows, self._cols]
        rdt = jnp.real(vals_rc).dtype
        out = self._const('_w_pack', rdt) * jnp.real(vals_rc)
        if self.is_complex:
            rt2 = jnp.sqrt(jnp.asarray(2.0, dtype=rdt))
            out = jnp.where(self._im, -rt2 * jnp.imag(vals_rc), out)
        return out

    def barrier(self, s):
        L = linalg.cholesky(self._mat(s))
        return -2 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(L))))

    def feas(self, s):
        L = linalg.cholesky(self._mat(s))
        return jnp.all(jnp.isfinite(jnp.real(L)))

    # -- explicit oracles (dense-impl semantics, `denseimpl.jl:24-122`) ----

    def point_aux(self, s):
        """X = mat(s), Cholesky, explicit inverse; the Hessian is the
        pattern-projected Kronecker H[p,q] = <A_p, X^-1 A_q X^-1> —
        materialized by columns of two-sided products and factored for the
        inverse oracle (the projection destroys the closed-form inverse,
        as in the reference dense impl)."""
        X = self._mat(s)
        L = linalg.cholesky(X)
        Li = linalg.tri_inverse(L)
        Xinv = Li.conj().T @ Li
        if not self.is_complex:
            # direct entrywise assembly (`denseimpl.jl:62-96`):
            # H[p,q] = w_p w_q (Z[a,c] Z[b,d] + Z[a,d] Z[b,c]) for pattern
            # entries p=(a,b), q=(c,d), with w=1/sqrt(2) on the diagonal —
            # O(dim^2) gathers instead of O(dim * side^3) products
            Z = Xinv
            Zac = Z[self._rows_col, self._rows_row]
            Zbd = Z[self._cols_col, self._cols_row]
            Zad = Z[self._rows_col, self._cols_row]
            Zbc = Z[self._cols_col, self._rows_row]
            # keep the weight outer product TRACED (1-D constants times the
            # traced sum): a numpy w[:,None]*w[None,:] constant-folds to a
            # dense dim x dim f64 literal per inlined call site (5 x 2.8 MB
            # at side 60)
            w_col = self._const('_w_hess_col', s.dtype)
            w_row = self._const('_w_hess_row', s.dtype)
            H = w_col * (Zac * Zbd + Zad * Zbc) * w_row
        else:
            cols = jax.vmap(
                lambda e: self._pack(Xinv @ self._mat(e) @ Xinv),
                in_axes=0)(jnp.eye(self.dim, dtype=s.dtype))
            H = (cols + cols.T) / 2
        Lh, ok = linalg.cholesky_shifted(H)
        return {"X": X, "L": L, "Xinv": Xinv, "hess": H, "hess_chol": Lh,
                "hess_chol_ok": ok, "hess_inv": linalg.chol_inverse(Lh)}

    def _get_aux(self, s, aux):
        if aux is None or "Xinv" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        return -self._pack(aux["Xinv"])

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        Xinv = aux["Xinv"]

        def one(col):
            Y = Xinv @ self._mat(col) @ Xinv
            return self._pack((Y + Y.conj().T) / 2)

        if arr.ndim == 1:
            return one(arr)
        return jax.vmap(one, in_axes=1, out_axes=1)(arr)

    def dder3(self, s, d, aux=None):
        aux = self._get_aux(s, aux)
        Xinv = aux["Xinv"]
        D = self._mat(d)
        Y = Xinv @ D
        Z = Y @ Y @ Xinv  # X^-1 D X^-1 D X^-1
        return self._pack((Z + Z.conj().T) / 2)


class _StructuredPSDSparse(PosSemidefTriSparse):
    """Shared oracle protocol of the structured (supernodal / banded)
    implementations.  Subclasses provide the structure-specific pieces:
    ``_factor(s)``, ``_selected_inverse(fact)``, ``_hess_apply(fact, sel,
    v)``, and ``_pack_grad(sel)``; this base hosts the aux-dict protocol,
    the Hessian materialization by column probes (`cholmodimpl.jl:288-377`),
    and the matrix-free CG inverse used by the line search."""

    def _factor(self, s):
        raise NotImplementedError

    def _selected_inverse(self, fact):
        raise NotImplementedError

    def _hess_apply(self, fact, sel, v):
        raise NotImplementedError

    def _pack_grad(self, sel):
        raise NotImplementedError

    # -- aux protocol --------------------------------------------------------

    def point_aux(self, s):
        fact = self._factor(s)
        sel = self._selected_inverse(fact)
        g = self._pack_grad(sel)
        H = jax.vmap(lambda e: self._hess_apply(fact, sel, e),
                     in_axes=0, out_axes=1)(jnp.eye(self.dim, dtype=s.dtype))
        H = (H + H.T) / 2
        Lh, okh = linalg.cholesky_shifted(H)
        return {"fact": fact, "sel": sel, "grad": g, "hess": H,
                "hess_chol": Lh, "hess_chol_ok": okh,
                "hess_inv": linalg.chol_inverse(Lh)}

    def point_aux_light(self, s):
        """Light aux for the batched line search: factorization + selected
        inverse + gradient only.  The inverse oracle (proximity,
        check_numerics) then runs as Jacobi-preconditioned CG on the
        matrix-free product recursion instead of materializing and
        factoring the dim x dim Hessian for every candidate."""
        fact = self._factor(s)
        sel = self._selected_inverse(fact)
        return {"fact": fact, "sel": sel, "grad": self._pack_grad(sel)}

    def _get_aux(self, s, aux):
        if aux is None or "fact" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        return self._get_aux(s, aux)["grad"]

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        fact, sel = aux["fact"], aux["sel"]
        if arr.ndim == 1:
            return self._hess_apply(fact, sel, arr)
        return jax.vmap(lambda v: self._hess_apply(fact, sel, v),
                        in_axes=1, out_axes=1)(arr)

    def inv_hess_prod(self, s, arr, aux=None):
        if aux is None:
            aux = self.point_aux(s)
        if "hess_chol" in aux:
            return super().inv_hess_prod(s, arr, aux)
        fact, sel = aux["fact"], aux["sel"]
        return self._cg_inv_hess_prod(
            lambda v: self._hess_apply(fact, sel, v),
            self._hess_diag_from_grad(aux["grad"]), arr)

    # -- matrix-free CG inverse ----------------------------------------------

    def _hess_diag_from_grad(self, g):
        """Closed-form diagonal of the Hessian from the gradient (selected
        inverse): H[p,p] = Z_aa Z_bb + Z_ab^2 for pattern entry p=(a,b)
        (w_p^2-scaled; the p=q case of `denseimpl.jl:62-96`).  For complex
        off-diagonals this uses the re/im component as the cross term —
        exact in the real case, an SPD approximation (preconditioner
        quality only) in the complex case."""
        zv = -g
        if not hasattr(self, "_diag_slots"):
            diag_slots = np.zeros(self.side, dtype=int)
            diag_slots[self._rows[self._diag]] = np.nonzero(self._diag)[0]
            self._diag_slots = diag_slots
        zd = zv[self._diag_slots]
        cross = zd[self._rows] * zd[self._cols]
        half = jnp.asarray(0.5, dtype=zv.dtype)
        dvals = jnp.where(self._offd, cross + half * zv * zv,
                          zd[self._rows] ** 2)
        return jnp.maximum(dvals, jnp.finfo(zv.dtype).tiny)

    def _cg_inv_hess_prod(self, matvec, diag, arr):
        """Jacobi-preconditioned CG solve of H x = arr using the
        matrix-free Hessian product — the line-search inverse oracle,
        which avoids materializing and factoring the dim x dim Hessian
        per candidate.

        Non-convergence is poisoned with NaN rather than returned
        silently: a NaN proximity / check_numerics value makes the line
        search REJECT the candidate — the same conservative semantics as
        treating a shift-needing factorization as infeasible
        (`Cone.point_aux_light`)."""
        import jax.scipy.sparse.linalg as jssl

        inv_d = 1.0 / diag

        def solve_one(b):
            x, _ = jssl.cg(matvec, b, M=lambda r: inv_d * r,
                           tol=1e-10, atol=0.0,
                           maxiter=min(10 * self.dim, 1000))
            res = jnp.linalg.norm(b - matvec(x))
            ok = res <= 1e-6 * (jnp.linalg.norm(b) +
                                jnp.finfo(b.dtype).tiny)
            return jnp.where(ok, x, jnp.full_like(x, jnp.nan))

        if arr.ndim == 1:
            return solve_one(arr)
        return jax.vmap(solve_one, in_axes=1, out_axes=1)(arr)


def structured_psd_sparse(side, row_idxs, col_idxs, is_complex=False,
                          use_dual=False, block=None):
    """Pick the best sparse-PSD implementation for a pattern.

    Banded patterns get the scan-form ``PosSemidefTriBanded``; exact arrow
    patterns the vmapped ``PosSemidefTriArrow``; everything else the
    generic supernodal implementation (or the dense implementation for
    complex / tiny patterns).  The returned cone's svec layout matches the
    entry order of the canonical pattern constructor used — callers that
    need a specific entry order should construct the class directly.
    """
    from hypatia_tpu.cones.psdbanded import PosSemidefTriBanded, band_pattern
    from hypatia_tpu.cones.psdarrow import PosSemidefTriArrow, detect_arrow

    rows = np.asarray(row_idxs)
    cols = np.asarray(col_idxs)
    if side <= 8:
        return PosSemidefTriSparse(side, rows, cols, is_complex=is_complex,
                                   use_dual=use_dual)
    # exact ORDER match required: the specialized classes define the
    # svec layout by their canonical entry order, so substituting them
    # for a permuted entry order would silently permute coordinates
    band = int(np.max(rows - cols))
    bp = band_pattern(side, band)
    if np.array_equal(bp[0], rows) and np.array_equal(bp[1], cols):
        return PosSemidefTriBanded(side, band, block=block,
                                   is_complex=is_complex, use_dual=use_dual)
    arrow = detect_arrow(side, rows, cols)
    if arrow is not None:
        return PosSemidefTriArrow(*arrow, is_complex=is_complex,
                                  use_dual=use_dual)
    from hypatia_tpu.cones.psdsparse_supernodal import (
        PosSemidefTriSparseSupernodal)
    return PosSemidefTriSparseSupernodal(side, rows, cols,
                                         is_complex=is_complex,
                                         use_dual=use_dual)
