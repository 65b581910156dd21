"""Supernodal (multifrontal) implementation of the sparse PSD cone.

Parity: `src/Cones/possemideftrisparse/cholmodimpl.jl` — the reference's
CHOLMOD-based supernodal implementation of `PosSemidefTriSparse` oracles.
Everything scales with the *filled factor* structure (sum of frontal-block
sizes) instead of the dense side^2 matrix: feasibility is a multifrontal
Cholesky, the gradient is a selected inversion (Takahashi-style backward
recursion on the frontal blocks, `cholmodimpl.jl:228-285`), and the Hessian
product / third-order oracle are the three-step linearized-factorization
recursions (`cholmodimpl.jl:402-521, 545-615`).

TPU-first design: the symbolic analysis (ordering, elimination tree,
supernode partition, relative indices) runs once on the host in numpy
(`ops/supernodal.py`, replacing CHOLMOD's symbolic factorization); the
numeric recursions below are pure jax functions of the svec point whose
per-supernode loop unrolls at trace time into static-shape dense block
operations — gathers plus small matmuls and triangular solves, all
MXU/VPU-friendly, with no data-dependent control flow.  Frontal matrices
are kept fully symmetric/Hermitian (the reference uses lower-storage
`Hermitian` views; the math is identical).

As in the reference (note at `cholmodimpl.jl:1-4`), the pattern need not be
chordal; there is no closed-form inverse Hessian, so the inverse oracle
factors the materialized Hessian (built by vmapping the product recursion
over unit vectors, like `update_hess`'s column probes,
`cholmodimpl.jl:288-377`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.psdsparse import (PosSemidefTriSparse,
                                         _StructuredPSDSparse)
from hypatia_tpu.ops import linalg
from hypatia_tpu.ops.supernodal import LevelSchedule, SupernodalStructure


def _sym(M):
    """Hermitian part (the recursions keep blocks Hermitian; this guards
    the scattered inputs, whose diagonal blocks are lower-stored)."""
    return (M + M.conj().T) / 2


def _rdiv2(X, L):
    """X @ (L L^H)^-1 — dispatched through cho_solve so the blocked
    substitution kernels vectorize it under vmapped contexts."""
    return linalg.cho_solve(L, X.conj().T).conj().T


def _mH(M):
    """Batched conjugate transpose (last two axes)."""
    return jnp.swapaxes(M.conj(), -1, -2)


def _symb(M):
    """Batched Hermitian part."""
    return (M + _mH(M)) / 2


def _rdiv2b(X, L):
    """Batched X @ (L L^H)^-1."""
    return _mH(linalg.cho_solve(L, _mH(X)))


def _sym_expand_diag(D):
    """Expand batched lower-stored (…, nn, nn) diagonal blocks to full
    Hermitian: D + D^H - diag(diag(D))."""
    nn = D.shape[-1]
    eye = jnp.eye(nn, dtype=jnp.real(D).dtype)
    d = jnp.diagonal(D, axis1=-2, axis2=-1)
    return D + _mH(D) - eye * d[..., None, :]


class PosSemidefTriSparseSupernodal(_StructuredPSDSparse):
    """`PosSemidefTriSparse` with supernodal oracles (reference
    `PSDSparseCholmod` impl). Same cone, same svec layout; cost scales with
    the filled supernodal structure rather than the dense side."""

    def __init__(self, side, row_idxs, col_idxs, is_complex=False,
                 use_dual=False, perm=None, bucketed=True):
        super().__init__(side, row_idxs, col_idxs, is_complex=is_complex,
                         use_dual=use_dual)
        S = self.symb = SupernodalStructure(side, self.row_idxs,
                                            self.col_idxs, perm=perm)
        # svec slot <-> pattern entry maps (complex: diag 1 slot, offdiag 2)
        nent = len(self.row_idxs)
        ent_slot = np.zeros(nent, dtype=int)
        slot = 0
        for e, (r, c) in enumerate(zip(self.row_idxs, self.col_idxs)):
            ent_slot[e] = slot
            slot += 2 if (self.is_complex and r != c) else 1
        assert slot == self.dim
        self._ent_slot = ent_slot
        self._ent_offd = (self.row_idxs != self.col_idxs)
        # group pattern entries by supernode for the scatter/pack loops
        self._sup_entries = [np.nonzero(S.ent_super == k)[0]
                             for k in range(S.num_super)]
        #: level-bucketed execution: program size scales with the number
        #: of distinct (level, shape) supernode groups instead of the
        #: supernode count (the per-supernode recursions unroll at trace
        #: time, capping usable pattern sizes via remote-compile cost)
        self.bucketed = bool(bucketed)
        self.sched = LevelSchedule(S, self._sup_entries)

    def params_key(self):
        return super().params_key() + (self.symb.perm.tobytes(),)

    # -- svec <-> per-supernode frontal blocks ------------------------------

    def _entry_values(self, s):
        """Lower-triangle matrix values per pattern entry, in the permuted
        block coordinates (svec scaling removed; complex entries conjugated
        where the permutation transposed them)."""
        irt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=s.dtype))
        re = s[self._ent_slot]
        if self.is_complex:
            # this repo's complex svec convention (cones/psdsparse._mat):
            # lower entry M[r,c] = (re - i*im)/sqrt2; a permutation swap
            # transposes the entry, conjugating it
            im = jnp.where(self._ent_offd, s[np.minimum(
                self._ent_slot + 1, self.dim - 1)], 0.0)
            sgn = jnp.asarray(np.where(self.symb.ent_swapped, 1.0, -1.0),
                              dtype=s.dtype)
            v = re + 1j * sgn * im
            return jnp.where(self._ent_offd, v * irt2, v)
        return jnp.where(self._ent_offd, re * irt2, re)

    def _blocks_from_svec(self, s):
        """Scatter a svec vector into per-supernode (nj, nn) blocks
        (diagonal block lower-stored, like `svec_to_smat_sparse!`)."""
        S = self.symb
        vals = self._entry_values(s)
        out = []
        for k in range(S.num_super):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            ent = self._sup_entries[k]
            B = jnp.zeros((nj, nn), dtype=vals.dtype)
            if len(ent):
                B = B.at[S.ent_row[ent], S.ent_col[ent]].set(vals[ent])
            out.append(B)
        return out

    def _svec_from_blocks(self, blocks):
        """Adjoint-layout read-out: pattern entries from block coordinates
        back to the svec vector (like `smat_to_svec_sparse!`)."""
        S = self.symb
        rdt = jnp.real(blocks[0]).dtype
        rt2 = jnp.sqrt(jnp.asarray(2.0, dtype=rdt))
        out = jnp.zeros(self.dim, dtype=rdt)
        for k in range(S.num_super):
            ent = self._sup_entries[k]
            if not len(ent):
                continue
            v = blocks[k][S.ent_row[ent], S.ent_col[ent]]
            offd = self._ent_offd[ent]
            slots = self._ent_slot[ent]
            re = jnp.real(v)
            re = jnp.where(offd, re * rt2, re)
            out = out.at[slots].set(re)
            if self.is_complex and offd.any():
                # inverse of _entry_values' sign convention
                sgn = jnp.asarray(np.where(self.symb.ent_swapped[ent],
                                           1.0, -1.0), dtype=rdt)
                im = sgn * jnp.imag(v) * rt2
                out = out.at[slots[offd] + 1].set(im[offd])
        return out

    # -- numeric multifrontal Cholesky --------------------------------------

    def _factor(self, s):
        """Multifrontal Cholesky of mat(s) on the filled structure.

        Returns per-supernode lower factors `Ln` (nn x nn), the *normalized*
        below blocks `Lan = L_a L_n^-1` (na x nn; the form the oracle
        recursions use, `cholmodimpl.jl:262`), and `ok`.
        """
        if self.bucketed:
            return self._factor_b(s)
        S = self.symb
        A = self._blocks_from_svec(s)
        dt = A[0].dtype
        Ln, Lan = [], []
        updates = [None] * S.num_super
        ok = jnp.asarray(True)
        for k in range(S.num_super):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            na = nj - nn
            F = jnp.zeros((nj, nj), dtype=dt)
            Fn = A[k]
            # symmetrize the lower-stored diagonal block
            D = Fn[:nn]
            D = D + D.conj().T - jnp.diag(jnp.diagonal(D))
            F = F.at[:nn, :nn].set(D)
            F = F.at[nn:, :nn].set(Fn[nn:])
            for c in S.children[k]:
                rel = S.rel_idx[c]
                F = F.at[rel[:, None], rel[None, :]].add(updates[c])
                updates[c] = None
            Lnk = linalg.cholesky(F[:nn, :nn])
            ok = ok & linalg.chol_ok(Lnk)
            Fan = F[nn:, :nn]
            LaH = linalg.tri_solve(Lnk, Fan.conj().T)   # La^H = L^-1 F_an^H
            Lank = linalg.tri_solve(Lnk, LaH, trans=True).conj().T
            # Gram-form update (exactly Hermitian PSD; the gemm form
            # Lan @ F_an^H loses ~cond*eps symmetry and stalls convergence)
            updates[k] = F[nn:, nn:] - LaH.conj().T @ LaH
            Ln.append(Lnk)
            Lan.append(Lank)
        return {"Ln": Ln, "Lan": Lan, "ok": ok}

    def barrier(self, s):
        fact = self._factor(s)
        total = sum(jnp.sum(jnp.log(jnp.real(
            jnp.diagonal(L, axis1=-2, axis2=-1))))
            for L in fact["Ln"])
        return -2 * total

    def feas(self, s):
        fact = self._factor(s)
        fin = [jnp.all(jnp.isfinite(jnp.real(L))) for L in fact["Ln"]]
        return fact["ok"] & jnp.all(jnp.stack(fin))

    # -- selected inversion (gradient), `cholmodimpl.jl:228-285` ------------

    def _selected_inverse(self, fact):
        """Backward recursion for the inverse projected onto the filled
        structure: per supernode the full inverse frontal Z (nj x nj) and
        its below-block `S = Z_aa` (reused by the Hessian recursions)."""
        if self.bucketed:
            return self._selected_inverse_b(fact)
        S = self.symb
        Z = [None] * S.num_super
        Zaa = [None] * S.num_super
        for k in reversed(range(S.num_super)):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            na = nj - nn
            Lnk = fact["Ln"][k]
            Znn = linalg.chol_inverse(Lnk)
            if na:
                rel = S.rel_idx[k]
                Zp = Z[S.parent[k]]
                Za = Zp[rel[:, None], rel[None, :]]
                Lank = fact["Lan"][k]
                Zan = -(Za @ Lank)
                Znn = Znn + Lank.conj().T @ Za @ Lank
                Zk = jnp.zeros((nj, nj), dtype=Znn.dtype)
                Zk = Zk.at[:nn, :nn].set(Znn)
                Zk = Zk.at[nn:, :nn].set(Zan)
                Zk = Zk.at[:nn, nn:].set(Zan.conj().T)
                Zk = Zk.at[nn:, nn:].set(Za)
            else:
                Za = jnp.zeros((0, 0), dtype=Znn.dtype)
                Zk = Znn
            Z[k] = Zk
            Zaa[k] = Za
        return {"Z": Z, "Zaa": Zaa}

    # -- Hessian product recursions, `cholmodimpl.jl:402-521` ---------------

    def _outer_L_prod(self, F, Lan, nn):
        """F_aa -= L_a F_an^H;  F_an -= L_a F_nn;  F_aa -= F_an L_a^H
        (`cholmodimpl.jl:523-543`)."""
        Fnn = F[:nn, :nn]
        Fan = F[nn:, :nn]
        Faa = F[nn:, nn:]
        Faa = Faa - Lan @ Fan.conj().T
        Fan = Fan - Lan @ Fnn
        Faa = Faa - Fan @ Lan.conj().T
        F = F.at[nn:, :nn].set(Fan)
        F = F.at[:nn, nn:].set(Fan.conj().T)
        F = F.at[nn:, nn:].set(Faa)
        return F

    def _hess_step1(self, fact, temp):
        """Forward (leaf-to-root) recursion of the linearized factorization
        (`_hess_step1`).  `temp` blocks must have Hermitian diagonal parts."""
        S = self.symb
        F = []
        for k in range(S.num_super):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            Fk = jnp.zeros((nj, nj), dtype=temp[k].dtype)
            # expand the lower-stored diagonal block to full Hermitian
            # (the reference reads it through Hermitian(:L) views)
            D = temp[k][:nn]
            D = D + D.conj().T - jnp.diag(jnp.diagonal(D))
            Fk = Fk.at[:nn, :nn].set(D)
            Fk = Fk.at[nn:, :nn].set(temp[k][nn:])
            Fk = Fk.at[:nn, nn:].set(temp[k][nn:].conj().T)
            F.append(Fk)
        out = [None] * S.num_super
        for k in range(S.num_super):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            if nj > nn:
                F[k] = self._outer_L_prod(F[k], fact["Lan"][k], nn)
                rel = S.rel_idx[k]
                p = S.parent[k]
                F[p] = F[p].at[rel[:, None], rel[None, :]].add(
                    F[k][nn:, nn:])
            out[k] = F[k][:, :nn]
        return out

    def _hess_step2(self, fact, sel, temp, save_l_pr=False):
        """Per-supernode middle transform (`_hess_step2`): sandwich the
        diagonal block with (L_n L_n^H)^-1 on both sides, right-divide the
        below block and multiply it by the selected-inverse S block."""
        S = self.symb
        out, l_pr = [], []
        for k in range(S.num_super):
            nn = int(S.num_cols[k])
            Lnk = fact["Ln"][k]
            Tn = _sym(temp[k][:nn, :])
            Ta = temp[k][nn:, :]
            pr_n = Tn
            Tn = linalg.cho_solve(Lnk, Tn)
            Tn = _rdiv2(Tn, Lnk)
            Ta = _rdiv2(Ta, Lnk)
            if save_l_pr:
                l_pr.append(jnp.concatenate([pr_n, Ta], axis=0))
            if Ta.shape[0]:
                Ta = sel["Zaa"][k] @ Ta
            out.append(jnp.concatenate([Tn, Ta], axis=0))
        return (out, l_pr) if save_l_pr else out

    def _hess_step3(self, fact, temp):
        """Backward (root-to-leaf) recursion (`_hess_step3`).  Returns the
        output blocks and the final full frontals (needed by dder3)."""
        S = self.symb
        F = [None] * S.num_super
        out = [None] * S.num_super
        for k in reversed(range(S.num_super)):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            Fk = jnp.zeros((nj, nj), dtype=temp[k].dtype)
            Fk = Fk.at[:nn, :nn].set(_sym(temp[k][:nn]))
            Fk = Fk.at[nn:, :nn].set(temp[k][nn:])
            Fk = Fk.at[:nn, nn:].set(temp[k][nn:].conj().T)
            if nj > nn:
                rel = S.rel_idx[k]
                Fp = F[S.parent[k]]
                Faa = Fp[rel[:, None], rel[None, :]]
                Lank = fact["Lan"][k]
                Fnn = Fk[:nn, :nn]
                Fan = Fk[nn:, :nn]
                Fnn = (Fnn - Fan.conj().T @ Lank - Lank.conj().T @ Fan
                       + Lank.conj().T @ Faa @ Lank)
                Fan = Fan - Faa @ Lank
                Fk = Fk.at[:nn, :nn].set(Fnn)
                Fk = Fk.at[nn:, :nn].set(Fan)
                Fk = Fk.at[:nn, nn:].set(Fan.conj().T)
                Fk = Fk.at[nn:, nn:].set(Faa)
            F[k] = Fk
            out[k] = Fk[:, :nn]
        return out, F

    def _hess_apply(self, fact, sel, v):
        if self.bucketed:
            temp = self._gblocks_from_svec(v)
            temp = self._hess_step1_b(fact, temp)
            temp = self._hess_step2_b(fact, sel, temp)
            temp, _ = self._hess_step3_b(fact, temp)
            return self._gsvec_from_blocks(temp)
        temp = self._blocks_from_svec(v)
        temp = self._hess_step1(fact, temp)
        temp = self._hess_step2(fact, sel, temp)
        temp, _ = self._hess_step3(fact, temp)
        return self._svec_from_blocks(temp)

    # -- cone oracle API (shared protocol in _StructuredPSDSparse) ----------

    def _pack_grad(self, sel):
        if self.bucketed:
            gblocks = [sel["Z"][gi][..., :, :nn]
                       for gi, (_, _, nn, _) in enumerate(self.sched.groups)]
            return -self._gsvec_from_blocks(gblocks)
        S = self.symb
        gblocks = [sel["Z"][k][:, :int(S.num_cols[k])]
                   for k in range(S.num_super)]
        return -self._svec_from_blocks(gblocks)

    def dder3(self, s, d, aux=None):
        """Third-order directional oracle via the linearized-inverse
        recursion (`cholmodimpl.jl:545-615`)."""
        aux = self._get_aux(s, aux)
        fact, sel = aux["fact"], aux["sel"]
        if self.bucketed:
            return self._dder3_b(fact, sel, d)
        S = self.symb

        temp = self._blocks_from_svec(d)
        temp = self._hess_step1(fact, temp)
        temp, l_pr = self._hess_step2(fact, sel, temp, save_l_pr=True)
        temp, F3 = self._hess_step3(fact, temp)
        S_pr = [F3[k][int(S.num_cols[k]):, int(S.num_cols[k]):]
                for k in range(S.num_super)]

        F = [jnp.zeros_like(F3[k]) for k in range(S.num_super)]
        out = [None] * S.num_super
        for k in range(S.num_super):
            nj, nn = int(S.num_rows[k]), int(S.num_cols[k])
            Lnk = fact["Ln"][k]
            Lank = fact["Lan"][k]
            D_pr = l_pr[k][:nn]       # symmetrized direction diag block
            Lpr_a = l_pr[k][nn:]      # below block after the rdivs
            if nj > nn:
                F[k] = self._outer_L_prod(F[k], Lank, nn)
                T = Lpr_a @ Lnk
                Faa = F[k][nn:, nn:] - 2 * (T @ T.conj().T)
                F[k] = F[k].at[nn:, nn:].set(Faa)
                rel = S.rel_idx[k]
                p = S.parent[k]
                F[p] = F[p].at[rel[:, None], rel[None, :]].add(Faa)
            # transform from linearized factorization to linearized inverse
            Lprpr = F[k][:, :nn]
            Lprpr_a = Lprpr[nn:] - 2 * (Lpr_a @ D_pr)
            Lprpr_a = _rdiv2(Lprpr_a, Lnk)
            Tn = -Lprpr[:nn]
            D2 = linalg.tri_solve(Lnk, D_pr)
            Tn = Tn + 2 * (D2.conj().T @ D2)
            Tn = linalg.cho_solve(Lnk, Tn)
            Tn = _rdiv2(Tn, Lnk)
            if nj > nn:
                Sk = sel["Zaa"][k]
                t1 = Sk @ Lpr_a
                Tn = Tn + 2 * (Lpr_a.conj().T @ t1)
                Ta = 2 * (S_pr[k] @ Lpr_a) - Sk @ Lprpr_a
            else:
                Ta = Lpr_a
            out[k] = jnp.concatenate([Tn, Ta], axis=0)

        out, _ = self._hess_step3(fact, out)
        return self._svec_from_blocks(out) / 2

    # ======================================================================
    # Level-bucketed engine: all per-supernode loops replaced by per-
    # (level, shape)-group vmapped kernels; program size scales with the
    # group count, not the supernode count (general trees compile like the
    # uniform chain/star patterns do).
    # ======================================================================

    def _gblocks_from_svec(self, s):
        """Per-group stacked frontal input blocks (g, nj, nn), padded
        entry scatter (masked adds onto zeros == set: entries unique)."""
        L = self.sched
        vals = self._entry_values(s)
        out = []
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            em = L.entry_maps[gi]
            g = len(members)
            B = jnp.zeros((g, nj, nn), dtype=vals.dtype)
            if em["idx"].size:
                v = jnp.where(em["mask"], vals[em["idx"]], 0.0)
                gidx = np.arange(g)[:, None]
                B = B.at[gidx, em["row"], em["col"]].add(v)
            out.append(B)
        return out

    def _gsvec_from_blocks(self, blocks):
        """Adjoint read-out: per-group stacked blocks -> svec vector."""
        L = self.sched
        rdt = jnp.real(blocks[0]).dtype
        rt2 = jnp.sqrt(jnp.asarray(2.0, dtype=rdt))
        out = jnp.zeros(self.dim, dtype=rdt)
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            em = L.entry_maps[gi]
            if not em["idx"].size:
                continue
            g = len(members)
            gidx = np.arange(g)[:, None]
            v = blocks[gi][gidx, em["row"], em["col"]]
            idx, mask = em["idx"], em["mask"]
            offd = self._ent_offd[idx]
            slots = self._ent_slot[idx]
            re = jnp.real(v)
            re = jnp.where(offd, re * rt2, re)
            out = out.at[slots].add(jnp.where(mask, re, 0.0))
            if self.is_complex:
                sgn = jnp.asarray(
                    np.where(self.symb.ent_swapped[idx], 1.0, -1.0),
                    dtype=rdt)
                im = sgn * jnp.imag(v) * rt2
                tgt = slots + offd.astype(int)
                out = out.at[tgt].add(jnp.where(mask & offd, im, 0.0))
        return out

    def _factor_b(self, s):
        L = self.sched
        A = self._gblocks_from_svec(s)
        G = L.num_groups()
        Ln, Lan, updates = [None] * G, [None] * G, [None] * G
        ok = jnp.asarray(True)
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            g = len(members)
            na = nj - nn
            dt = A[gi].dtype
            F = jnp.zeros((g, nj, nj), dtype=dt)
            F = F.at[:, :nn, :nn].set(_sym_expand_diag(A[gi][:, :nn, :]))
            if na:
                F = F.at[:, nn:, :nn].set(A[gi][:, nn:, :])
            for e in L.edges_into.get(gi, []):
                Uc = updates[e["child_group"]][e["child_slots"]]
                ps, rel = e["parent_slots"], e["rel"]
                F = F.at[ps[:, None, None], rel[:, :, None],
                         rel[:, None, :]].add(Uc)
            Lnk = linalg.cholesky(F[:, :nn, :nn])
            ok = ok & linalg.chol_ok(Lnk)
            Fan = F[:, nn:, :nn]
            LaH = linalg.tri_solve(Lnk, _mH(Fan))
            Lank = _mH(linalg.tri_solve(Lnk, LaH, trans=True))
            updates[gi] = F[:, nn:, nn:] - _mH(LaH) @ LaH
            Ln[gi], Lan[gi] = Lnk, Lank
        return {"Ln": Ln, "Lan": Lan, "ok": ok}

    def _selected_inverse_b(self, fact):
        L = self.sched
        G = L.num_groups()
        Z, Zaa = [None] * G, [None] * G
        for gi in reversed(range(G)):
            _, nj, nn, members = L.groups[gi]
            g = len(members)
            na = nj - nn
            Lnk = fact["Ln"][gi]
            Znn = linalg.chol_inverse(Lnk)
            if na:
                Za = jnp.zeros((g, na, na), dtype=Znn.dtype)
                for e in L.edges_from.get(gi, []):
                    Zp = Z[e["parent_group"]]
                    ps, rel = e["parent_slots"], e["rel"]
                    sub = Zp[ps[:, None, None], rel[:, :, None],
                             rel[:, None, :]]
                    Za = Za.at[e["child_slots"]].set(sub)
                Lank = fact["Lan"][gi]
                Zan = -(Za @ Lank)
                Znn = Znn + _mH(Lank) @ Za @ Lank
                Zk = jnp.zeros((g, nj, nj), dtype=Znn.dtype)
                Zk = Zk.at[:, :nn, :nn].set(Znn)
                Zk = Zk.at[:, nn:, :nn].set(Zan)
                Zk = Zk.at[:, :nn, nn:].set(_mH(Zan))
                Zk = Zk.at[:, nn:, nn:].set(Za)
            else:
                Za = jnp.zeros((g, 0, 0), dtype=Znn.dtype)
                Zk = Znn
            Z[gi], Zaa[gi] = Zk, Za
        return {"Z": Z, "Zaa": Zaa}

    def _outer_L_prod_b(self, F, Lan, nn):
        Fnn = F[:, :nn, :nn]
        Fan = F[:, nn:, :nn]
        Faa = F[:, nn:, nn:]
        Faa = Faa - Lan @ _mH(Fan)
        Fan = Fan - Lan @ Fnn
        Faa = Faa - Fan @ _mH(Lan)
        F = F.at[:, nn:, :nn].set(Fan)
        F = F.at[:, :nn, nn:].set(_mH(Fan))
        F = F.at[:, nn:, nn:].set(Faa)
        return F

    def _full_frontals_b(self, temp):
        """Lift per-group (g, nj, nn) column blocks to full Hermitian
        (g, nj, nj) frontals."""
        L = self.sched
        F = []
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            g = len(members)
            Fk = jnp.zeros((g, nj, nj), dtype=temp[gi].dtype)
            Fk = Fk.at[:, :nn, :nn].set(_sym_expand_diag(temp[gi][:, :nn, :]))
            if nj > nn:
                Fk = Fk.at[:, nn:, :nn].set(temp[gi][:, nn:, :])
                Fk = Fk.at[:, :nn, nn:].set(_mH(temp[gi][:, nn:, :]))
            F.append(Fk)
        return F

    def _hess_step1_b(self, fact, temp):
        L = self.sched
        G = L.num_groups()
        F = self._full_frontals_b(temp)
        out = [None] * G
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            if nj > nn:
                F[gi] = self._outer_L_prod_b(F[gi], fact["Lan"][gi], nn)
                for e in L.edges_from.get(gi, []):
                    contrib = F[gi][e["child_slots"], nn:, nn:]
                    ps, rel = e["parent_slots"], e["rel"]
                    pg = e["parent_group"]
                    F[pg] = F[pg].at[ps[:, None, None], rel[:, :, None],
                                     rel[:, None, :]].add(contrib)
            out[gi] = F[gi][:, :, :nn]
        return out

    def _hess_step2_b(self, fact, sel, temp, save_l_pr=False):
        L = self.sched
        out, l_pr = [], []
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            Lnk = fact["Ln"][gi]
            Tn = _symb(temp[gi][:, :nn, :])
            Ta = temp[gi][:, nn:, :]
            pr_n = Tn
            Tn = linalg.cho_solve(Lnk, Tn)
            Tn = _rdiv2b(Tn, Lnk)
            Ta = _rdiv2b(Ta, Lnk)
            if save_l_pr:
                l_pr.append(jnp.concatenate([pr_n, Ta], axis=-2))
            if Ta.shape[-2]:
                Ta = sel["Zaa"][gi] @ Ta
            out.append(jnp.concatenate([Tn, Ta], axis=-2))
        return (out, l_pr) if save_l_pr else out

    def _hess_step3_b(self, fact, temp):
        L = self.sched
        G = L.num_groups()
        F = [None] * G
        out = [None] * G
        for gi in reversed(range(G)):
            _, nj, nn, members = L.groups[gi]
            g = len(members)
            na = nj - nn
            Fk = jnp.zeros((g, nj, nj), dtype=temp[gi].dtype)
            Fk = Fk.at[:, :nn, :nn].set(_symb(temp[gi][:, :nn, :]))
            if na:
                Fk = Fk.at[:, nn:, :nn].set(temp[gi][:, nn:, :])
                Fk = Fk.at[:, :nn, nn:].set(_mH(temp[gi][:, nn:, :]))
                Faa = jnp.zeros((g, na, na), dtype=Fk.dtype)
                for e in L.edges_from.get(gi, []):
                    Fp = F[e["parent_group"]]
                    ps, rel = e["parent_slots"], e["rel"]
                    sub = Fp[ps[:, None, None], rel[:, :, None],
                             rel[:, None, :]]
                    Faa = Faa.at[e["child_slots"]].set(sub)
                Lank = fact["Lan"][gi]
                Fnn = Fk[:, :nn, :nn]
                Fan = Fk[:, nn:, :nn]
                Fnn = (Fnn - _mH(Fan) @ Lank - _mH(Lank) @ Fan
                       + _mH(Lank) @ Faa @ Lank)
                Fan = Fan - Faa @ Lank
                Fk = Fk.at[:, :nn, :nn].set(Fnn)
                Fk = Fk.at[:, nn:, :nn].set(Fan)
                Fk = Fk.at[:, :nn, nn:].set(_mH(Fan))
                Fk = Fk.at[:, nn:, nn:].set(Faa)
            F[gi] = Fk
            out[gi] = Fk[:, :, :nn]
        return out, F

    def _dder3_b(self, fact, sel, d):
        L = self.sched
        G = L.num_groups()
        temp = self._gblocks_from_svec(d)
        temp = self._hess_step1_b(fact, temp)
        temp, l_pr = self._hess_step2_b(fact, sel, temp, save_l_pr=True)
        temp, F3 = self._hess_step3_b(fact, temp)
        S_pr = [F3[gi][:, L.groups[gi][2]:, L.groups[gi][2]:]
                for gi in range(G)]

        F = [jnp.zeros_like(F3[gi]) for gi in range(G)]
        out = [None] * G
        for gi, (_, nj, nn, members) in enumerate(L.groups):
            na = nj - nn
            Lnk = fact["Ln"][gi]
            Lank = fact["Lan"][gi]
            D_pr = l_pr[gi][:, :nn, :]
            Lpr_a = l_pr[gi][:, nn:, :]
            if na:
                F[gi] = self._outer_L_prod_b(F[gi], Lank, nn)
                T = Lpr_a @ Lnk
                Faa = F[gi][:, nn:, nn:] - 2 * (T @ _mH(T))
                F[gi] = F[gi].at[:, nn:, nn:].set(Faa)
                for e in L.edges_from.get(gi, []):
                    ps, rel = e["parent_slots"], e["rel"]
                    pg = e["parent_group"]
                    F[pg] = F[pg].at[ps[:, None, None], rel[:, :, None],
                                     rel[:, None, :]].add(
                        Faa[e["child_slots"]])
            Lprpr = F[gi][:, :, :nn]
            Lprpr_a = Lprpr[:, nn:, :] - 2 * (Lpr_a @ D_pr)
            Lprpr_a = _rdiv2b(Lprpr_a, Lnk)
            Tn = -Lprpr[:, :nn, :]
            D2 = linalg.tri_solve(Lnk, D_pr)
            Tn = Tn + 2 * (_mH(D2) @ D2)
            Tn = linalg.cho_solve(Lnk, Tn)
            Tn = _rdiv2b(Tn, Lnk)
            if na:
                Sk = sel["Zaa"][gi]
                t1 = Sk @ Lpr_a
                Tn = Tn + 2 * (_mH(Lpr_a) @ t1)
                Ta = 2 * (S_pr[gi] @ Lpr_a) - Sk @ Lprpr_a
            else:
                Ta = Lpr_a
            out[gi] = jnp.concatenate([Tn, Ta], axis=-2)

        out, _ = self._hess_step3_b(fact, out)
        return self._gsvec_from_blocks(out) / 2
