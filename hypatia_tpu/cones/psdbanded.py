"""Banded sparse-PSD cone with scan-form (block-tridiagonal) oracles.

Same cone as ``PosSemidefTriSparse(side, banded pattern)`` — symmetric
(or complex Hermitian) matrices with bandwidth ``band`` that are PSD — but
the oracles process the matrix as a block-tridiagonal chain of
``block >= band`` columns per supernode, padded to uniform shape, and run
as ``lax.scan`` loops whose compiled program size is O(1) in ``side`` (the
generic supernodal implementation unrolls one dense block program per
supernode; on TPU the remote compile of a side=1000 chain would dominate).
Each scan step is m x m Cholesky/solve/matmul work — MXU-sized when
``block`` is chosen ~128 — with a single m x m carry (the multifrontal
update matrix / selected-inverse boundary block).

Math parity: the supernodal recursions of
`src/Cones/possemideftrisparse/cholmodimpl.jl` specialized to a chain
elimination tree with relaxed (zero-padded) supernodes — padding the below
structure to the full next block adds explicit zeros to the factor and
changes no oracle value on the pattern.  Validated against the dense and
generic supernodal implementations in ``tests/test_psdbanded.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from hypatia_tpu.cones.psdsparse import (PosSemidefTriSparse,
                                         _StructuredPSDSparse)
from hypatia_tpu.ops import linalg


def band_pattern(side, band):
    """Row-major lower-triangle banded pattern with full diagonal."""
    rows, cols = [], []
    for i in range(side):
        for j in range(max(0, i - band), i + 1):
            rows.append(i)
            cols.append(j)
    return np.asarray(rows), np.asarray(cols)


def _symd(D):
    """Expand a lower-stored block to full symmetric/Hermitian."""
    return D + D.conj().T - jnp.diag(jnp.diagonal(D))


def _rdiv2(X, L):
    """X @ (L L^H)^-1 for lower L — dispatched through cho_solve so the
    blocked substitution kernels vectorize it under vmapped contexts."""
    return linalg.cho_solve(L, X.conj().T).conj().T


class PosSemidefTriBanded(_StructuredPSDSparse):
    """Banded PSD cone; svec layout identical to ``PosSemidefTriSparse``
    over ``band_pattern(side, band)``."""

    def __init__(self, side, band, block=None, is_complex=False,
                 use_dual=False):
        rows, cols = band_pattern(side, band)
        super().__init__(side, rows, cols, is_complex=is_complex,
                         use_dual=use_dual)
        self.band = int(band)
        m = int(block) if block is not None else max(int(band), 1)
        assert m >= band, "block size must cover the bandwidth"
        self.m = m
        self.nb = max(1, -(-side // m))  # ceil
        self.side_pad = self.nb * m
        # entry -> (chain block, row within 2m frontal, col within block)
        eb = cols // m
        self._eb = eb
        self._er = rows - eb * m
        self._ec = cols - eb * m
        assert np.all(self._er < 2 * m)
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
        # phantom identity diagonal for the padded tail columns
        pad = np.zeros((self.nb, 2 * m, m))
        for d in range(side, self.side_pad):
            k = d // m
            pad[k, d - k * m, d - k * m] = 1.0
        self._pad = pad
        self._w = np.where(rows == cols, 1.0, 1.0 / np.sqrt(2.0))

    def params_key(self):
        return (self.side, self.band, self.m, self.is_complex)

    # -- svec <-> (nb, 2m, m) chain blocks ----------------------------------

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

    def _chain_blocks(self, v, pad=False):
        vals = self._entry_vals(v)
        A = jnp.zeros((self.nb, 2 * self.m, self.m), dtype=vals.dtype)
        A = A.at[self._eb, self._er, self._ec].set(vals)
        if pad:
            A = A + jnp.asarray(self._pad, dtype=vals.dtype)
        return A

    def _chain_pack(self, T):
        vals = T[self._eb, self._er, self._ec]
        rdt = jnp.real(vals).dtype
        w = jnp.asarray(self._w, dtype=rdt)
        out = jnp.zeros(self.dim, dtype=rdt)
        out = out.at[self._ent_slot].set(jnp.real(vals) / w)
        if self.is_complex:
            offd = self._ent_offd
            out = out.at[self._ent_slot[offd] + 1].set(
                -jnp.imag(vals)[offd] / w[offd])
        return out

    # -- multifrontal Cholesky as a forward scan ----------------------------

    def _factor(self, s):
        m = self.m
        A = self._chain_blocks(s, pad=True)

        def step(U, Ak):
            D = _symd(Ak[:m]) - U
            B = Ak[m:]
            L = linalg.cholesky(D)
            LaH = linalg.tri_solve(L, B.conj().T)       # La^H = L^-1 B^H
            Lan = linalg.tri_solve(L, LaH, trans=True).conj().T
            # Gram-form update (exactly Hermitian PSD — the gemm form
            # Lan @ B^H loses ~cond*eps symmetry and stalls convergence)
            return LaH.conj().T @ LaH, (L, Lan)

        _, (Ln, Lan) = lax.scan(step,
                                jnp.zeros((m, m), dtype=A.dtype), A)
        return {"Ln": Ln, "Lan": Lan}

    def barrier(self, s):
        fact = self._factor(s)
        d = jnp.real(jnp.diagonal(fact["Ln"], axis1=-2, axis2=-1))
        return -2 * jnp.sum(jnp.log(d))

    def feas(self, s):
        fact = self._factor(s)
        return jnp.all(jnp.isfinite(jnp.real(fact["Ln"]))) & \
            jnp.all(jnp.isfinite(jnp.imag(fact["Ln"])))

    # -- selected inverse (gradient) as a reverse scan ----------------------

    def _selected_inverse(self, fact):
        m = self.m

        def step(Zaa, LLan):
            L, Lan = LLan
            Znn = linalg.chol_inverse(L) + Lan.conj().T @ Zaa @ Lan
            Zan = -Zaa @ Lan
            return Znn, (Znn, Zan)

        _, (Znn, Zan) = lax.scan(step,
                                 jnp.zeros((m, m), dtype=fact["Ln"].dtype),
                                 (fact["Ln"], fact["Lan"]), reverse=True)
        # S[k] = Z at node k's below rows = Znn[k+1]
        S = jnp.concatenate([Znn[1:], jnp.zeros_like(Znn[:1])], axis=0)
        return {"Znn": Znn, "Zan": Zan, "S": S}

    # -- Hessian product recursions as scans --------------------------------

    def _step1(self, fact, V):
        """Forward linearized-factorization recursion (carry = the F_aa
        contribution scattered into the next block's diagonal region)."""
        m = self.m

        def step(C, xs):
            Vk, Lan = xs
            Fnn = _symd(Vk[:m]) + C
            Fan = Vk[m:]
            Fan2 = Fan - Lan @ Fnn
            C2 = -(Lan @ Fan.conj().T) - Fan2 @ Lan.conj().T
            return C2, (Fnn, Fan2)

        _, out = lax.scan(step, jnp.zeros((m, m), dtype=V.dtype),
                          (V, fact["Lan"]))
        return out

    def _step2(self, fact, sel, Fnn, Fan, save_l_pr=False):
        """Per-block middle transform (batched, no chain dependency)."""
        def one(L, S, Tn, Ta):
            pr_n = Tn
            Tn = linalg.cho_solve(L, Tn)
            Tn = _rdiv2(Tn, L)
            Ta = _rdiv2(Ta, L)
            pr_a = Ta
            Ta = S @ Ta
            return Tn, Ta, pr_n, pr_a

        Tn, Ta, pr_n, pr_a = jax.vmap(one)(fact["Ln"], sel["S"], Fnn, Fan)
        if save_l_pr:
            return Tn, Ta, pr_n, pr_a
        return Tn, Ta

    def _step3(self, fact, Tn, Ta):
        """Reverse recursion (carry = the parent's transformed diagonal
        block, gathered as this block's F_aa). Also returns the gathered
        F_aa per block (dder3's S_pr)."""
        def step(P, xs):
            Tnk, Tak, Lan = xs
            Fnn = (Tnk - Tak.conj().T @ Lan - Lan.conj().T @ Tak
                   + Lan.conj().T @ P @ Lan)
            Fan = Tak - P @ Lan
            return Fnn, (Fnn, Fan, P)

        _, (Fnn, Fan, Spr) = lax.scan(
            step, jnp.zeros((self.m, self.m), dtype=Tn.dtype),
            (Tn, Ta, fact["Lan"]), reverse=True)
        return Fnn, Fan, Spr

    def _hess_apply(self, fact, sel, v):
        V = self._chain_blocks(v)
        Fnn, Fan = self._step1(fact, V)
        Tn, Ta = self._step2(fact, sel, Fnn, Fan)
        On, Oa, _ = self._step3(fact, Tn, Ta)
        return self._chain_pack(jnp.concatenate([On, Oa], axis=1))

    # -- cone oracle API (shared protocol in _StructuredPSDSparse) ----------

    def _pack_grad(self, sel):
        return -self._chain_pack(
            jnp.concatenate([sel["Znn"], sel["Zan"]], axis=1))

    def dder3(self, s, d, aux=None):
        """Linearized-inverse recursion (`cholmodimpl.jl:545-615`) in
        chain-scan form."""
        aux = self._get_aux(s, aux)
        fact, sel = aux["fact"], aux["sel"]
        m = self.m

        V = self._chain_blocks(d)
        Fnn, Fan = self._step1(fact, V)
        Tn, Ta, Lpr_n, Lpr_a = self._step2(fact, sel, Fnn, Fan,
                                           save_l_pr=True)
        _, _, Spr = self._step3(fact, Tn, Ta)

        def phase2(C, xs):
            L, Lan, Dpr, La_pr, Sk, Sprk = xs
            # outer_L_prod on F = [C; 0; 0] then the -2 T T' update
            Fan2 = -(Lan @ C)
            Faa = -(Fan2 @ Lan.conj().T)
            T = La_pr @ L
            Faa = Faa - 2 * (T @ T.conj().T)
            # transform from linearized factorization to linearized inverse
            Lprpr_a = Fan2 - 2 * (La_pr @ Dpr)
            Lprpr_a = _rdiv2(Lprpr_a, L)
            D2 = linalg.tri_solve(L, Dpr)
            Tn2 = -C + 2 * (D2.conj().T @ D2)
            Tn2 = linalg.cho_solve(L, Tn2)
            Tn2 = _rdiv2(Tn2, L)
            t1 = Sk @ La_pr
            Tn2 = Tn2 + 2 * (La_pr.conj().T @ t1)
            Ta2 = 2 * (Sprk @ La_pr) - Sk @ Lprpr_a
            return Faa, (Tn2, Ta2)

        _, (Tn2, Ta2) = lax.scan(
            phase2, jnp.zeros((m, m), dtype=V.dtype),
            (fact["Ln"], fact["Lan"], Lpr_n, Lpr_a, sel["S"], Spr))
        On, Oa, _ = self._step3(fact, Tn2, Ta2)
        return self._chain_pack(jnp.concatenate([On, Oa], axis=1)) / 2
