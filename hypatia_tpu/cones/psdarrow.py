"""Block-arrow sparse-PSD cone with vmapped per-block oracles.

Same cone as ``PosSemidefTriSparse`` over a bordered-block-diagonal
("arrow") pattern — K independent diagonal blocks of size b coupled only
through a shared border of m trailing rows/columns — but the multifrontal
recursions exploit the star-shaped elimination tree: every block supernode
is a leaf whose parent is the border supernode, so all per-block work is a
single ``jax.vmap`` over K (batched MXU matmuls/Cholesky) plus one border
reduction.  Program size is O(1) in K; per-oracle cost is O(K·(b+m)³)
batched instead of O(side³) dense.

Math parity: `src/Cones/possemideftrisparse/cholmodimpl.jl` recursions
specialized to the star tree (see `psdbanded.py` for the chain case; the
same verified block identities apply with the parent gather being the
border's diagonal block).  Real symmetric only.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.psdsparse import _StructuredPSDSparse
from hypatia_tpu.ops import linalg


def arrow_pattern(nblocks, bsize, border):
    """Lower-triangle pattern: K dense diagonal blocks + dense border."""
    rows, cols = [], []
    n0 = nblocks * bsize
    side = n0 + border
    for k in range(nblocks):
        o = k * bsize
        for j in range(bsize):
            for i in range(j, bsize):
                rows.append(o + i)
                cols.append(o + j)
            for i in range(n0, side):
                rows.append(i)
                cols.append(o + j)
    for j in range(n0, side):
        for i in range(j, side):
            rows.append(i)
            cols.append(j)
    return np.asarray(rows), np.asarray(cols)


def _symd(D):
    return D + jnp.swapaxes(D, -1, -2) - jnp.eye(D.shape[-1],
                                                 dtype=D.dtype) * \
        jnp.expand_dims(jnp.diagonal(D, axis1=-2, axis2=-1), -2)


class PosSemidefTriArrow(_StructuredPSDSparse):
    """Arrow (bordered block-diagonal) PSD cone; svec layout identical to
    ``PosSemidefTriSparse`` over ``arrow_pattern(nblocks, bsize, border)``."""

    def __init__(self, nblocks, bsize, border, use_dual=False):
        rows, cols = arrow_pattern(nblocks, bsize, border)
        side = nblocks * bsize + border
        super().__init__(side, rows, cols, is_complex=False,
                         use_dual=use_dual)
        self.K = int(nblocks)
        self.b = int(bsize)
        self.mb = int(border)
        n0 = self.K * self.b
        # entry -> structure coordinates
        is_brd = cols >= n0
        is_cpl = (~is_brd) & (rows >= n0)
        is_blk = (~is_brd) & (~is_cpl)
        self._blk_sel = np.nonzero(is_blk)[0]
        self._cpl_sel = np.nonzero(is_cpl)[0]
        self._brd_sel = np.nonzero(is_brd)[0]
        self._blk_k = cols[is_blk] // self.b
        self._blk_r = rows[is_blk] - self._blk_k * self.b
        self._blk_c = cols[is_blk] - self._blk_k * self.b
        self._cpl_k = cols[is_cpl] // self.b
        self._cpl_r = rows[is_cpl] - n0
        self._cpl_c = cols[is_cpl] - self._cpl_k * self.b
        self._brd_r = rows[is_brd] - n0
        self._brd_c = cols[is_brd] - n0
        self._w = np.where(rows == cols, 1.0, 1.0 / np.sqrt(2.0))

    def params_key(self):
        return (self.K, self.b, self.mb, self.is_complex)

    # -- svec <-> (K,b,b), (K,m,b), (m,m) structure blocks -------------------

    def _parts(self, v):
        vals = v * jnp.asarray(self._w, dtype=v.dtype)
        blk = jnp.zeros((self.K, self.b, self.b), dtype=v.dtype).at[
            self._blk_k, self._blk_r, self._blk_c].set(vals[self._blk_sel])
        cpl = jnp.zeros((self.K, self.mb, self.b), dtype=v.dtype).at[
            self._cpl_k, self._cpl_r, self._cpl_c].set(vals[self._cpl_sel])
        brd = jnp.zeros((self.mb, self.mb), dtype=v.dtype).at[
            self._brd_r, self._brd_c].set(vals[self._brd_sel])
        return blk, cpl, brd

    def _pack(self, blk, cpl, brd):
        out = jnp.zeros(self.dim, dtype=blk.dtype)
        out = out.at[self._blk_sel].set(
            blk[self._blk_k, self._blk_r, self._blk_c])
        out = out.at[self._cpl_sel].set(
            cpl[self._cpl_k, self._cpl_r, self._cpl_c])
        out = out.at[self._brd_sel].set(brd[self._brd_r, self._brd_c])
        return out / jnp.asarray(self._w, dtype=blk.dtype)

    # -- multifrontal factorization (vmap over blocks + border reduce) ------

    def _factor(self, s):
        Ablk, Acpl, Abrd = self._parts(s)
        Lk = linalg.cholesky(_symd(Ablk))
        LaT = jax.vmap(lambda L, C: linalg.tri_solve(L, C.T))(Lk, Acpl)
        Lan = jnp.swapaxes(
            jax.vmap(lambda L, X: linalg.tri_solve(L, X, trans=True))(
                Lk, LaT), -1, -2)
        U = jnp.einsum("kbm,kbn->mn", LaT, LaT)
        Fb = _symd(Abrd) - U
        Lb = linalg.cholesky(Fb)
        return {"Lk": Lk, "Lan": Lan, "Lb": Lb}

    def barrier(self, s):
        fact = self._factor(s)
        return -2 * (jnp.sum(jnp.log(jnp.diagonal(
            fact["Lk"], axis1=-2, axis2=-1)))
            + jnp.sum(jnp.log(jnp.diagonal(fact["Lb"]))))

    def feas(self, s):
        fact = self._factor(s)
        return jnp.all(jnp.isfinite(fact["Lk"])) & \
            jnp.all(jnp.isfinite(fact["Lb"]))

    # -- selected inverse -----------------------------------------------------

    def _selected_inverse(self, fact):
        Zbb = linalg.chol_inverse(fact["Lb"])
        Lan = fact["Lan"]
        Zan = -jnp.einsum("ij,kjb->kib", Zbb, Lan)
        Znn = jax.vmap(linalg.chol_inverse)(fact["Lk"]) + \
            jnp.einsum("kmb,mn,knc->kbc", Lan, Zbb, Lan)
        return {"Znn": Znn, "Zan": Zan, "Zbb": Zbb}

    def _pack_grad(self, sel):
        return -self._pack(sel["Znn"], sel["Zan"], sel["Zbb"])

    # -- Hessian product recursions ------------------------------------------

    def _rdiv2(self, X, L):
        """X (L L^T)^-1, batched over a leading axis of both."""
        return jnp.swapaxes(jax.vmap(linalg.cho_solve)(
            L, jnp.swapaxes(X, -1, -2)), -1, -2)

    def _recursion(self, fact, sel, parts, save_l_pr=False):
        """step1 + step2 of the linearized-factorization recursion
        (`cholmodimpl.jl:402-486`) on the star tree."""
        Vblk, Vcpl, Vbrd = parts
        Lk, Lan, Lb = fact["Lk"], fact["Lan"], fact["Lb"]
        # step1: blocks are leaves; border collects their F_aa
        Fnn = _symd(Vblk)
        Fan2 = Vcpl - jnp.einsum("kmb,kbc->kmc", Lan, Fnn)
        C = -(jnp.einsum("kmb,knb->mn", Lan, Vcpl)
              + jnp.einsum("kmb,knb->mn", Fan2, Lan))
        Fnn_b = _symd(Vbrd) + C
        # step2
        pr_n, pr_a, pr_b = Fnn, None, Fnn_b
        Tn = self._rdiv2(jax.vmap(linalg.cho_solve)(Lk, Fnn), Lk)
        Ta = self._rdiv2(Fan2, Lk)
        pr_a = Ta
        Ta = jnp.einsum("ij,kjb->kib", sel["Zbb"], Ta)
        Tn_b = linalg.cho_solve(Lb, Fnn_b)
        Tn_b = linalg.cho_solve(Lb, Tn_b.T).T
        if save_l_pr:
            return (Tn, Ta, Tn_b), (pr_n, pr_a, pr_b)
        return Tn, Ta, Tn_b

    def _step3(self, fact, Tn, Ta, Tn_b):
        """Backward pass: border first (it has no below block), then each
        block gathers the border's transformed diagonal as its F_aa."""
        Lan = fact["Lan"]
        P = Tn_b
        Fnn = (Tn - jnp.einsum("kmb,kmc->kbc", Ta, Lan)
               - jnp.einsum("kmb,kmc->kbc", Lan, Ta)
               + jnp.einsum("kmb,mn,knc->kbc", Lan, P, Lan))
        Fan = Ta - jnp.einsum("mn,knb->kmb", P, Lan)
        return Fnn, Fan, P

    def _hess_apply(self, fact, sel, v):
        parts = self._parts(v)
        Tn, Ta, Tn_b = self._recursion(fact, sel, parts)
        Fnn, Fan, _ = self._step3(fact, Tn, Ta, Tn_b)
        return self._pack(Fnn, Fan, Tn_b)

    def dder3(self, s, d, aux=None):
        """Linearized-inverse recursion (`cholmodimpl.jl:545-615`) on the
        star tree (cf. the chain version in `psdbanded.dder3`)."""
        aux = self._get_aux(s, aux)
        fact, sel = aux["fact"], aux["sel"]
        Lk, Lan, Lb, Zbb = fact["Lk"], fact["Lan"], fact["Lb"], sel["Zbb"]

        parts = self._parts(d)
        (Tn, Ta, Tn_b), (Dpr, Lpr_a, Dpr_b) = self._recursion(
            fact, sel, parts, save_l_pr=True)
        _, _, Spr = self._step3(fact, Tn, Ta, Tn_b)  # per-block F_aa gather

        # phase 2, blocks (leaves: frontal starts at zero)
        T = jnp.einsum("kmb,kbc->kmc", Lpr_a, Lk)
        Faa = -2 * jnp.einsum("kmb,knb->kmn", T, T)
        C2 = jnp.sum(Faa, axis=0)
        Lprpr_a = self._rdiv2(-2 * jnp.einsum("kmb,kbc->kmc", Lpr_a, Dpr),
                              Lk)
        D2 = jax.vmap(linalg.tri_solve)(Lk, Dpr)
        Tn2 = 2 * jnp.einsum("kbm,kbn->kmn", D2, D2)
        Tn2 = self._rdiv2(jax.vmap(linalg.cho_solve)(Lk, Tn2), Lk)
        t1 = jnp.einsum("ij,kjb->kib", Zbb, Lpr_a)
        Tn2 = Tn2 + 2 * jnp.einsum("kmb,kmc->kbc", Lpr_a, t1)
        Ta2 = (2 * jnp.einsum("mn,knb->kmb", Spr, Lpr_a)
               - jnp.einsum("mn,knb->kmb", Zbb, Lprpr_a))
        # phase 2, border (collects the children's F_aa; no below block)
        D2b = linalg.tri_solve(Lb, Dpr_b)
        Tn2_b = -C2 + 2 * (D2b.T @ D2b)
        Tn2_b = linalg.cho_solve(Lb, Tn2_b)
        Tn2_b = linalg.cho_solve(Lb, Tn2_b.T).T

        Fnn, Fan, _ = self._step3(fact, Tn2, Ta2, Tn2_b)
        return self._pack(Fnn, Fan, Tn2_b) / 2


def detect_arrow(side, row_idxs, col_idxs):
    """Return (nblocks, bsize, border) if the pattern is exactly an
    arrow_pattern, else None."""
    rows = np.asarray(row_idxs)
    cols = np.asarray(col_idxs)
    if not np.any(rows != cols):
        return None
    # exact order match required (the svec layout is the entry order)
    for border in range(1, side):
        n0 = side - border
        for bsize in range(1, n0 + 1):
            if n0 % bsize:
                continue
            cand = arrow_pattern(n0 // bsize, bsize, border)
            if np.array_equal(cand[0], rows) and np.array_equal(cand[1],
                                                                cols):
                return n0 // bsize, bsize, border
    return None
