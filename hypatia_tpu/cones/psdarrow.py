"""Block-arrow sparse-PSD cone with vmapped per-block oracles.

Same cone as ``PosSemidefTriSparse`` over a bordered-block-diagonal
("arrow") pattern — K independent diagonal blocks of size b coupled only
through a shared border of m trailing rows/columns — but the multifrontal
recursions exploit the star-shaped elimination tree: every block supernode
is a leaf whose parent is the border supernode, so all per-block work is a
single ``jax.vmap`` over K (batched MXU matmuls/Cholesky) plus one border
reduction.  Program size is O(1) in K; per-oracle cost is O(K·(b+m)³)
batched instead of O(side³) dense.  Real symmetric and complex Hermitian.

Math parity: `src/Cones/possemideftrisparse/cholmodimpl.jl` recursions
specialized to the star tree (see `psdbanded.py` for the chain case; the
same verified block identities apply with the parent gather being the
border's diagonal block).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.psdsparse import _StructuredPSDSparse
from hypatia_tpu.cones.psdbanded import _rdiv2
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
    """Expand lower-stored block(s) to full symmetric/Hermitian."""
    return D + jnp.conj(jnp.swapaxes(D, -1, -2)) - jnp.eye(
        D.shape[-1], dtype=D.dtype) * jnp.expand_dims(
        jnp.diagonal(D, axis1=-2, axis2=-1), -2)


class PosSemidefTriArrow(_StructuredPSDSparse):
    """Arrow (bordered block-diagonal) PSD cone; svec layout identical to
    ``PosSemidefTriSparse`` over ``arrow_pattern(nblocks, bsize, border)``."""

    def __init__(self, nblocks, bsize, border, is_complex=False,
                 use_dual=False):
        rows, cols = arrow_pattern(nblocks, bsize, border)
        side = nblocks * bsize + border
        super().__init__(side, rows, cols, is_complex=is_complex,
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
        # entry -> svec slot (complex off-diagonals take two slots)
        nent = len(rows)
        ent_slot = np.zeros(nent, dtype=int)
        slot = 0
        for e in range(nent):
            ent_slot[e] = slot
            slot += 2 if (self.is_complex and rows[e] != cols[e]) else 1
        assert slot == self.dim
        self._ent_slot = ent_slot
        self._ent_offd = rows != cols
        self._w = np.where(rows == cols, 1.0, 1.0 / np.sqrt(2.0))

    def params_key(self):
        return (self.K, self.b, self.mb, self.is_complex)

    # -- svec <-> (K,b,b), (K,m,b), (m,m) structure blocks -------------------

    def _entry_vals(self, v):
        """Per-entry lower-triangle matrix values with svec scaling removed
        (this repo's convention: lower M[r,c] = (re - i*im)/sqrt2)."""
        w = jnp.asarray(self._w, dtype=v.dtype)
        re = v[self._ent_slot]
        if self.is_complex:
            im = jnp.where(self._ent_offd, v[np.minimum(
                self._ent_slot + 1, self.dim - 1)], 0.0)
            return (re - 1j * im) * w
        return re * w

    def _parts(self, v):
        vals = self._entry_vals(v)
        blk = jnp.zeros((self.K, self.b, self.b), dtype=vals.dtype).at[
            self._blk_k, self._blk_r, self._blk_c].set(vals[self._blk_sel])
        cpl = jnp.zeros((self.K, self.mb, self.b), dtype=vals.dtype).at[
            self._cpl_k, self._cpl_r, self._cpl_c].set(vals[self._cpl_sel])
        brd = jnp.zeros((self.mb, self.mb), dtype=vals.dtype).at[
            self._brd_r, self._brd_c].set(vals[self._brd_sel])
        return blk, cpl, brd

    def _pack(self, blk, cpl, brd):
        vals = jnp.zeros(len(self._ent_slot), dtype=blk.dtype)
        vals = vals.at[self._blk_sel].set(
            blk[self._blk_k, self._blk_r, self._blk_c])
        vals = vals.at[self._cpl_sel].set(
            cpl[self._cpl_k, self._cpl_r, self._cpl_c])
        vals = vals.at[self._brd_sel].set(brd[self._brd_r, self._brd_c])
        rdt = jnp.real(vals).dtype
        w = jnp.asarray(self._w, dtype=rdt)
        out = jnp.zeros(self.dim, dtype=rdt)
        out = out.at[self._ent_slot].set(jnp.real(vals) / w)
        if self.is_complex:
            offd = self._ent_offd
            out = out.at[self._ent_slot[offd] + 1].set(
                -jnp.imag(vals)[offd] / w[offd])
        return out

    # -- multifrontal factorization (vmap over blocks + border reduce) ------

    def _factor(self, s):
        Ablk, Acpl, Abrd = self._parts(s)
        Lk = linalg.cholesky(_symd(Ablk))
        LaH = jax.vmap(lambda L, C: linalg.tri_solve(L, C.conj().T))(
            Lk, Acpl)                                     # La^H = L^-1 C^H
        Lan = jnp.conj(jnp.swapaxes(
            jax.vmap(lambda L, X: linalg.tri_solve(L, X, trans=True))(
                Lk, LaH), -1, -2))                        # C (L L^H)^-1
        U = jnp.einsum("kbm,kbn->mn", jnp.conj(LaH), LaH)
        Fb = _symd(Abrd) - U
        Lb = linalg.cholesky(Fb)
        return {"Lk": Lk, "Lan": Lan, "Lb": Lb}

    def barrier(self, s):
        fact = self._factor(s)
        return -2 * (jnp.sum(jnp.log(jnp.real(jnp.diagonal(
            fact["Lk"], axis1=-2, axis2=-1))))
            + jnp.sum(jnp.log(jnp.real(jnp.diagonal(fact["Lb"])))))

    def feas(self, s):
        fact = self._factor(s)

        def fin(X):
            return jnp.all(jnp.isfinite(jnp.real(X))) & \
                jnp.all(jnp.isfinite(jnp.imag(X)))

        return fin(fact["Lk"]) & fin(fact["Lb"])

    # -- selected inverse -----------------------------------------------------

    def _selected_inverse(self, fact):
        Zbb = linalg.chol_inverse(fact["Lb"])
        Lan = fact["Lan"]
        Zan = -jnp.einsum("ij,kjb->kib", Zbb, Lan)
        Znn = jax.vmap(linalg.chol_inverse)(fact["Lk"]) + \
            jnp.einsum("kmb,mn,knc->kbc", jnp.conj(Lan), Zbb, Lan)
        return {"Znn": Znn, "Zan": Zan, "Zbb": Zbb}

    def _pack_grad(self, sel):
        return -self._pack(sel["Znn"], sel["Zan"], sel["Zbb"])

    # -- Hessian product recursions ------------------------------------------

    def _recursion(self, fact, sel, parts, save_l_pr=False):
        """step1 + step2 of the linearized-factorization recursion
        (`cholmodimpl.jl:402-486`) on the star tree."""
        Vblk, Vcpl, Vbrd = parts
        Lk, Lan, Lb = fact["Lk"], fact["Lan"], fact["Lb"]
        # step1: blocks are leaves; border collects their F_aa
        Fnn = _symd(Vblk)
        Fan2 = Vcpl - jnp.einsum("kmb,kbc->kmc", Lan, Fnn)
        C = -(jnp.einsum("kmb,knb->mn", Lan, jnp.conj(Vcpl))
              + jnp.einsum("kmb,knb->mn", Fan2, jnp.conj(Lan)))
        Fnn_b = _symd(Vbrd) + C
        # step2
        pr_n = Fnn
        Tn = jax.vmap(_rdiv2)(jax.vmap(linalg.cho_solve)(Lk, Fnn), Lk)
        Ta = jax.vmap(_rdiv2)(Fan2, Lk)
        pr_a = Ta
        Ta = jnp.einsum("ij,kjb->kib", sel["Zbb"], Ta)
        Tn_b = _rdiv2(linalg.cho_solve(Lb, Fnn_b), Lb)
        if save_l_pr:
            return (Tn, Ta, Tn_b), (pr_n, pr_a, Fnn_b)
        return Tn, Ta, Tn_b

    def _step3(self, fact, Tn, Ta, Tn_b):
        """Backward pass: border first (it has no below block), then each
        block gathers the border's transformed diagonal as its F_aa."""
        Lan = fact["Lan"]
        P = Tn_b
        Fnn = (Tn - jnp.einsum("kmb,kmc->kbc", jnp.conj(Ta), Lan)
               - jnp.einsum("kmb,kmc->kbc", jnp.conj(Lan), Ta)
               + jnp.einsum("kmb,mn,knc->kbc", jnp.conj(Lan), P, Lan))
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
        Faa = -2 * jnp.einsum("kmb,knb->kmn", T, jnp.conj(T))
        C2 = jnp.sum(Faa, axis=0)
        Lprpr_a = jax.vmap(_rdiv2)(
            -2 * jnp.einsum("kmb,kbc->kmc", Lpr_a, Dpr), Lk)
        D2 = jax.vmap(linalg.tri_solve)(Lk, Dpr)
        Tn2 = 2 * jnp.einsum("kbm,kbn->kmn", jnp.conj(D2), D2)
        Tn2 = jax.vmap(_rdiv2)(jax.vmap(linalg.cho_solve)(Lk, Tn2), Lk)
        t1 = jnp.einsum("ij,kjb->kib", Zbb, Lpr_a)
        Tn2 = Tn2 + 2 * jnp.einsum("kmb,kmc->kbc", jnp.conj(Lpr_a), t1)
        Ta2 = (2 * jnp.einsum("mn,knb->kmb", Spr, Lpr_a)
               - jnp.einsum("mn,knb->kmb", Zbb, Lprpr_a))
        # phase 2, border (collects the children's F_aa; no below block)
        D2b = linalg.tri_solve(Lb, Dpr_b)
        Tn2_b = -C2 + 2 * (D2b.conj().T @ D2b)
        Tn2_b = _rdiv2(linalg.cho_solve(Lb, Tn2_b), Lb)

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
