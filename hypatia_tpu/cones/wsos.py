"""Interpolant-basis weighted sum-of-squares cones.

`WSOSInterpNonnegative`: cone of point-evaluations vectors of polynomials
that are WSOS on the domain encoded by the Ps matrices.  Uses a **dual
barrier** -sum_k logdet(P_k' Diag(x) P_k) with nu = sum_k L_k
(`src/Cones/wsosinterpnonnegative.jl:1-115`).

All oracle work is Cholesky of the K small L_k x L_k Gram matrices
Lambda_k = P_k' D(x) P_k plus MXU matmuls — on TPU the K blocks evaluate in
parallel inside one jitted program (replacing the reference's sequential
timing-ordered loop `wsosinterpnonnegative.jl:93-98`).

Matrix/SOC-valued WSOS variants (`wsosinterppossemideftri.jl`,
`wsosinterpepinormeucl.jl`, `wsosinterpepinormone.jl`) follow the same
Lambda-block pattern with block/arrowhead structure.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.ops import linalg
from hypatia_tpu.ops.svec import svec_length, _svec_indices


class WSOSInterpNonnegative(Cone):
    def __init__(self, U: int, Ps, use_dual: bool = False):
        Ps = [np.asarray(P) for P in Ps]
        for P in Ps:
            assert P.shape[0] == U
        # NOTE reference semantics: this cone uses the dual barrier by
        # default (use_dual flips it back; `wsosinterpnonnegative.jl:56`)
        super().__init__(U, use_dual=not use_dual)
        self.Ps = Ps
        self._nu = sum(P.shape[1] for P in Ps)

    def params_key(self):
        return tuple(P.tobytes() for P in self.Ps)

    @property
    def nu(self):
        return self._nu

    def init_point(self):
        return np.ones(self.dim)

    def _lambdas(self, s):
        return [jnp.asarray(P).conj().T @ (s[:, None] * jnp.asarray(P))
                for P in self.Ps]

    def barrier(self, s):
        out = 0.0
        for lam in self._lambdas(s):
            L = jnp.linalg.cholesky(lam)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for lam in self._lambdas(s):
            L = jnp.linalg.cholesky(lam)
            ok = ok & jnp.all(jnp.isfinite(L))
        return ok

    def point_aux(self, s):
        """Cholesky of each Lambda_k and the probe products
        LFP_k = L_k^-1 P_k' used by grad/hess (`:119-150` semantics)."""
        Ls = []
        LFPs = []
        for P in self.Ps:
            Pj = jnp.asarray(P)
            lam = Pj.conj().T @ (s[:, None] * Pj)
            L = jnp.linalg.cholesky(lam)
            LFP = linalg.solve_tri(L, Pj.conj().T, lower=True)  # (Lk, U)
            Ls.append(L)
            LFPs.append(LFP)
        aux = {"chols": Ls, "LFPs": LFPs}
        # the solver's per-candidate proximity/numerics checks need Hi, so
        # build the Hessian factor eagerly (H = sum_k |M_k|^2 is dense UxU)
        H = self.hess(None, aux)
        Lh, ok = linalg.cholesky_shifted(H)
        aux.update({"hess": H, "hess_chol": Lh, "hess_chol_ok": ok,
                    "hess_inv": linalg.chol_inverse(Lh)})
        return aux

    def _get_aux(self, s, aux):
        if aux is None or "LFPs" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        g = jnp.zeros(self.dim, dtype=s.dtype)
        for LFP in aux["LFPs"]:
            # grad_u = -sum_k ||LFP[:, u]||^2
            g = g - jnp.real(jnp.sum(LFP * jnp.conj(LFP), axis=0))
        return g

    def hess(self, s, aux=None):
        if aux is None:
            aux = self.point_aux(s)
        H = jnp.zeros((self.dim, self.dim), dtype=jnp.float64)
        for LFP in aux["LFPs"]:
            M = LFP.conj().T @ LFP  # (U, U)
            H = H + jnp.real(M * jnp.conj(M))
        return H

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        H = self.hess(s, aux)
        return H @ arr

    def inv_hess_prod(self, s, arr, aux=None):
        if aux is None or "hess_chol" not in aux:
            aux = self.point_aux(s)
        if "hess_inv" in aux:
            return aux["hess_inv"] @ arr
        L = aux["hess_chol"]
        if arr.ndim == 1:
            return linalg.cho_solve(L, arr[:, None])[:, 0]
        return linalg.cho_solve(L, arr)

    def dder3(self, s, d, aux=None):
        """-1/2 D^3(-logdet Lam(x))[d,d] = diag(M D_d M D_d M) with
        M = P Lam^-1 P' and D_d = Diag(d)."""
        aux = self._get_aux(s, aux)
        out = jnp.zeros(self.dim, dtype=jnp.float64)
        for LFP in aux["LFPs"]:
            M = LFP.conj().T @ LFP       # (U, U) = P Lam^-1 P'
            MdM = (M * d[None, :]) @ M   # M D_d M
            out = out + jnp.real(jnp.sum(MdM * d[None, :] * M.T, axis=1))
        return out

class WSOSInterpPosSemidefTri(Cone):
    """WSOS PSD-matrix-valued polynomials (interpolant basis).

    dim = U * svec_length(R); svec-ordered U-blocks with off-diagonal blocks
    scaled by sqrt(2). Barrier -sum_k logdet(Lambda_k) with the (L_k R) x
    (L_k R) block Gram matrix Lambda_k[(i,j)] = P_k' D(p_ij) P_k;
    nu = R * sum L_k (`wsosinterppossemideftri.jl:1-110`). Dual barrier.
    """

    def __init__(self, R: int, U: int, Ps, use_dual: bool = False):
        Ps = [np.asarray(P) for P in Ps]
        for P in Ps:
            assert P.shape[0] == U
        super().__init__(U * svec_length(R), use_dual=not use_dual)
        self.R = R
        self.U = U
        self.Ps = Ps
        self._nu = R * sum(P.shape[1] for P in Ps)

    def params_key(self):
        return (self.R,) + tuple(P.tobytes() for P in self.Ps)

    @property
    def nu(self):
        return self._nu

    def init_point(self):
        pt = np.zeros(self.dim)
        block = 0
        for j in range(self.R):
            for i in range(j + 1):
                if i == j:
                    pt[block * self.U:(block + 1) * self.U] = 1.0
                block += 1
        return pt

    def _lambda_big(self, s, P):
        U, R = self.U, self.R
        L = P.shape[1]
        irt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=jnp.float64))
        lam = jnp.zeros((L * R, L * R), dtype=jnp.float64)
        block = 0
        for j in range(self.R):
            for i in range(j + 1):
                p_ij = s[block * U:(block + 1) * U]
                scale = 1.0 if i == j else irt2
                blk = P.T @ ((scale * p_ij)[:, None] * P)
                lam = lam.at[i * L:(i + 1) * L, j * L:(j + 1) * L].set(blk)
                if i != j:
                    lam = lam.at[j * L:(j + 1) * L, i * L:(i + 1) * L].set(
                        blk.T)
                block += 1
        return lam

    def barrier(self, s):
        out = 0.0
        for P in self.Ps:
            lam = self._lambda_big(s, jnp.asarray(P))
            Lc = jnp.linalg.cholesky(lam)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Lc)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            lam = self._lambda_big(s, jnp.asarray(P))
            Lc = jnp.linalg.cholesky(lam)
            ok = ok & jnp.all(jnp.isfinite(Lc))
        return ok


class WSOSInterpEpiNormEucl(Cone):
    """WSOS second-order-cone-valued polynomials (polynomial norm).

    dim = U * R, layout (p_1, ..., p_R). Barrier per P_k:
    -logdet(Lam_11 - sum_r Lam_r Lam_11^-1 Lam_r) - logdet(Lam_11);
    nu = 2 sum L_k (`wsosinterpepinormeucl.jl:1-110`). Dual barrier.
    """

    def __init__(self, R: int, U: int, Ps, use_dual: bool = False):
        Ps = [np.asarray(P) for P in Ps]
        super().__init__(U * R, use_dual=not use_dual)
        self.R = R
        self.U = U
        self.Ps = Ps
        self._nu = 2 * sum(P.shape[1] for P in Ps)

    def params_key(self):
        return (self.R,) + tuple(P.tobytes() for P in self.Ps)

    @property
    def nu(self):
        return self._nu

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[:self.U] = 1.0
        return pt

    def _lams(self, s, P):
        U = self.U
        return [P.T @ (s[r * U:(r + 1) * U, None] * P)
                for r in range(self.R)]

    def barrier(self, s):
        out = 0.0
        for P in self.Ps:
            Pj = jnp.asarray(P)
            lams = self._lams(s, Pj)
            L11 = jnp.linalg.cholesky(lams[0])
            schur = lams[0]
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11, lam_r)
                schur = schur - lam_r @ X
            Ls = jnp.linalg.cholesky((schur + schur.T) / 2)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L11)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            Pj = jnp.asarray(P)
            lams = self._lams(s, Pj)
            L11 = jnp.linalg.cholesky(lams[0])
            ok = ok & jnp.all(jnp.isfinite(L11))
            L11s = jnp.where(jnp.isfinite(L11), L11,
                             jnp.eye(L11.shape[0], dtype=jnp.float64))
            schur = lams[0]
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11s, lam_r)
                schur = schur - lam_r @ X
            Ls = jnp.linalg.cholesky((schur + schur.T) / 2)
            ok = ok & jnp.all(jnp.isfinite(Ls))
        return ok


class WSOSInterpEpiNormOne(Cone):
    """WSOS l1-norm-epigraph-valued polynomials.

    dim = U * R, layout (p_1, ..., p_R). Barrier per P_k:
    -sum_{r>=2} logdet(Lam_11 - Lam_r Lam_11^-1 Lam_r) - logdet(Lam_11);
    nu = R sum L_k (`wsosinterpepinormone.jl:1-120`). Dual barrier.
    """

    def __init__(self, R: int, U: int, Ps, use_dual: bool = False):
        Ps = [np.asarray(P) for P in Ps]
        super().__init__(U * R, use_dual=not use_dual)
        self.R = R
        self.U = U
        self.Ps = Ps
        self._nu = R * sum(P.shape[1] for P in Ps)

    def params_key(self):
        return (self.R,) + tuple(P.tobytes() for P in self.Ps)

    @property
    def nu(self):
        return self._nu

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[:self.U] = 1.0
        return pt

    def _lams(self, s, P):
        U = self.U
        return [P.T @ (s[r * U:(r + 1) * U, None] * P)
                for r in range(self.R)]

    def barrier(self, s):
        out = 0.0
        for P in self.Ps:
            Pj = jnp.asarray(P)
            lams = self._lams(s, Pj)
            L11 = jnp.linalg.cholesky(lams[0])
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L11)))
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11, lam_r)
                schur = lams[0] - lam_r @ X
                Ls = jnp.linalg.cholesky((schur + schur.T) / 2)
                out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            Pj = jnp.asarray(P)
            lams = self._lams(s, Pj)
            L11 = jnp.linalg.cholesky(lams[0])
            ok = ok & jnp.all(jnp.isfinite(L11))
            L11s = jnp.where(jnp.isfinite(L11), L11,
                             jnp.eye(L11.shape[0], dtype=jnp.float64))
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11s, lam_r)
                schur = lams[0] - lam_r @ X
                Ls = jnp.linalg.cholesky((schur + schur.T) / 2)
                ok = ok & jnp.all(jnp.isfinite(Ls))
        return ok
