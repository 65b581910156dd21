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



def _P_as(P, like):
    """Interpolation matrix P in the point's precision: cone params are
    stored as f64/c128 numpy, but the solver is dtype-generic (f32 solves
    pass f32 points; mixing would silently promote every oracle to f64)."""
    dt = jnp.asarray(like).dtype
    if np.iscomplexobj(P):
        dt = jnp.complex64 if dt == jnp.float32 else jnp.complex128
    return jnp.asarray(P, dtype=dt)

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
        return [_P_as(P, s).conj().T @ (s[:, None] * _P_as(P, s))
                for P in self.Ps]

    def barrier(self, s):
        out = 0.0
        for lam in self._lambdas(s):
            L = linalg.cholesky(lam)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for lam in self._lambdas(s):
            L = linalg.cholesky(lam)
            ok = ok & jnp.all(jnp.isfinite(L))
        return ok

    def point_aux(self, s):
        """Cholesky of each Lambda_k and the probe products
        LFP_k = L_k^-1 P_k' used by grad/hess (`:119-150` semantics)."""
        Ls = []
        LFPs = []
        for P in self.Ps:
            Pj = _P_as(P, s)
            lam = Pj.conj().T @ (s[:, None] * Pj)
            L = linalg.cholesky(lam)
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
        H = jnp.zeros((self.dim, self.dim),
                      dtype=jnp.real(aux["LFPs"][0]).dtype)
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
        out = jnp.zeros(self.dim, dtype=s.dtype)
        for LFP in aux["LFPs"]:
            M = LFP.conj().T @ LFP       # (U, U) = P Lam^-1 P'
            MdM = (M * d[None, :]) @ M   # M D_d M
            out = out + jnp.real(jnp.sum(MdM * d[None, :] * M.T, axis=1))
        return out

def _ld_grad(Qt, terms):
    """grad of -logdet(linear map) for one coordinate group: the coordinate
    with doubled-pair terms [(i, j, a)] has grad[u] = -sum 2a Qt[i,j][u,u]."""
    g = 0.0
    for i, j, a in terms:
        g = g - 2.0 * a * jnp.diagonal(Qt[i, j])
    return g


def _ld_hess_block(Qt, terms_x, terms_y):
    """Hessian block (U x U) of -logdet(linear map) between two coordinate
    groups with doubled-pair terms: sum 2 a1 a2 (Q[ik]Q[jl] + Q[il]Q[jk])."""
    blk = 0.0
    for i, j, a1 in terms_x:
        for k, l, a2 in terms_y:
            blk = blk + 2.0 * a1 * a2 * (Qt[i, k] * Qt[j, l]
                                         + Qt[i, l] * Qt[j, k])
    return blk


def _ld_dder3(P, M4, terms):
    """dder3 of -logdet(linear map) for one coordinate group:
    sum 2a diag(P M_ij P') with M = S D S D S reshaped to blocks."""
    out = 0.0
    for i, j, a in terms:
        PM = P @ M4[i, :, j, :] @ P.T
        out = out + 2.0 * a * jnp.diagonal(PM)
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
        irt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=s.dtype))
        lam = jnp.zeros((L * R, L * R), dtype=s.dtype)
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
            lam = self._lambda_big(s, _P_as(P, s))
            Lc = linalg.cholesky(lam)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Lc)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            lam = self._lambda_big(s, _P_as(P, s))
            Lc = linalg.cholesky(lam)
            ok = ok & jnp.all(jnp.isfinite(Lc))
        return ok

    # -- closed-form oracles (`wsosinterppossemideftri.jl:111-321`) --------
    #
    # The barrier is -sum_k logdet(Lam_k(s)) with Lam_k LINEAR in s:
    # coordinate ((i,j), u) maps to A = a_ij (E_ij + E_ji) (x) P_u P_u'
    # with P_u = row u of P_k and a_ij = 1/rt2 off-diagonal, 1/2 diagonal
    # (doubled convention).  With S = Lam^-1 and the Q-tensor
    # Q[r,t][u,v] = P_u' S_rt P_v, the logdet-of-linear-map identities give
    #   grad[(ij),u]              = -2 a_ij Q[i,j][u,u]
    #   H[((ij),u),((kl),v)]      = 2 a_ij a_kl (Q[i,k]Q[j,l]
    #                                            + Q[i,l]Q[j,k])[u,v]
    #   dder3[(ij),u]             = 2 a_ij (P M_ij P')[u,u],
    #                                M = S D S D S, D = Lam-map of d.

    def _blocks(self):
        pairs = []
        for j in range(self.R):
            for i in range(j + 1):
                pairs.append((i, j))
        return pairs

    def _q_tensor(self, P, S):
        L = P.shape[1]
        S4 = S.reshape(self.R, L, self.R, L)
        return jnp.einsum("ul,rltm,vm->rtuv", P, S4, P)

    def point_aux(self, s):
        Ss, Qts, Lcs = [], [], []
        ok = jnp.asarray(True)
        for P in self.Ps:
            Pj = _P_as(P, s)
            lam = self._lambda_big(s, Pj)
            Lc = linalg.cholesky(lam)
            ok = ok & jnp.all(jnp.isfinite(Lc))
            Lcs.append(Lc)
            eye = jnp.eye(lam.shape[0], dtype=lam.dtype)
            Li = linalg.solve_tri(
                jnp.where(jnp.isfinite(Lc), Lc, eye), eye, lower=True)
            S = Li.T @ Li
            Ss.append(S)
            Qts.append(self._q_tensor(Pj, S))
        aux = {"Ss": Ss, "Qts": Qts, "lam_ok": ok}
        H = self.hess(None, aux)
        Lh, hok = linalg.cholesky_shifted(H)
        aux.update({"hess": H, "hess_chol": Lh, "hess_chol_ok": hok,
                    "hess_inv": linalg.chol_inverse(Lh)})
        return aux

    def _get_aux(self, s, aux):
        if aux is None or "Qts" not in aux:
            return self.point_aux(s)
        return aux

    def _scales(self):
        irt2 = 1.0 / np.sqrt(2.0)
        return [0.5 if i == j else irt2 for (i, j) in self._blocks()]

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        U = self.U
        blocks, scales = self._blocks(), self._scales()
        g = jnp.zeros(self.dim, dtype=s.dtype)
        for Qt in aux["Qts"]:
            parts = []
            for (i, j), a in zip(blocks, scales):
                parts.append(-2.0 * a * jnp.diagonal(Qt[i, j]))
            g = g + jnp.concatenate(parts)
        return g

    def hess(self, s, aux=None):
        aux = self._get_aux(s, aux)
        if "hess" in aux:
            return aux["hess"]
        U = self.U
        blocks, scales = self._blocks(), self._scales()
        nb = len(blocks)
        dt = jnp.real(aux["Qts"][0]).dtype
        H = jnp.zeros((self.dim, self.dim), dtype=dt)
        for Qt in aux["Qts"]:
            rows = []
            for (i, j), a1 in zip(blocks, scales):
                row = []
                for (k, l), a2 in zip(blocks, scales):
                    blk = 2.0 * a1 * a2 * (Qt[i, k] * Qt[j, l]
                                           + Qt[i, l] * Qt[j, k])
                    row.append(blk)
                rows.append(jnp.concatenate(row, axis=1))
            H = H + jnp.concatenate(rows, axis=0)
        return H

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        return self.hess(s, aux) @ arr

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
        aux = self._get_aux(s, aux)
        U = self.U
        L0 = self.Ps[0].shape[1]
        blocks, scales = self._blocks(), self._scales()
        out = jnp.zeros(self.dim, dtype=s.dtype)
        for P, S in zip(self.Ps, aux["Ss"]):
            Pj = _P_as(P, d)
            L = Pj.shape[1]
            D = self._lambda_big(d, Pj)
            M = S @ D @ S @ D @ S
            M4 = M.reshape(self.R, L, self.R, L)
            parts = []
            for (i, j), a in zip(blocks, scales):
                PM = Pj @ M4[i, :, j, :] @ Pj.T
                parts.append(2.0 * a * jnp.diagonal(PM))
            out = out + jnp.concatenate(parts)
        return out


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
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            L11 = linalg.cholesky(lams[0])
            schur = lams[0]
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11, lam_r)
                schur = schur - lam_r @ X
            Ls = linalg.cholesky((schur + schur.T) / 2)
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L11)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            L11 = linalg.cholesky(lams[0])
            ok = ok & jnp.all(jnp.isfinite(L11))
            L11s = jnp.where(jnp.isfinite(L11), L11,
                             jnp.eye(L11.shape[0], dtype=L11.dtype))
            schur = lams[0]
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11s, lam_r)
                schur = schur - lam_r @ X
            Ls = linalg.cholesky((schur + schur.T) / 2)
            ok = ok & jnp.all(jnp.isfinite(Ls))
        return ok

    # -- closed-form oracles (`wsosinterpepinormeucl.jl:120-382`) ----------
    #
    # The barrier equals -logdet(Arrow(s)) + (R-2) logdet(Lam_11(s)) where
    # Arrow is the LINEAR arrowhead map (diagonal blocks all Lam_11, first
    # row/col edge blocks Lam_r): logdet(Arrow) = (R-1) logdet(Lam_11)
    # + logdet(Schur).  Both pieces are logdets of linear maps, so the
    # Q-tensor identities (see WSOSInterpPosSemidefTri) give every oracle.

    def _terms(self):
        terms = [[(t, t, 0.5) for t in range(self.R)]]
        for r in range(1, self.R):
            terms.append([(0, r, 1.0)])
        return terms

    def _arrow(self, vals):
        """Arrowhead matrix of the per-block Gram matrices (linear in s)."""
        L = vals[0].shape[0]
        R = self.R
        Arr = jnp.zeros((R * L, R * L), dtype=vals[0].dtype)
        for r in range(R):
            Arr = Arr.at[r * L:(r + 1) * L, r * L:(r + 1) * L].set(vals[0])
        for r in range(1, R):
            Arr = Arr.at[0:L, r * L:(r + 1) * L].set(vals[r])
            Arr = Arr.at[r * L:(r + 1) * L, 0:L].set(vals[r])
        return Arr

    def _q_tensor(self, P, S, nblk):
        L = P.shape[1]
        S4 = S.reshape(nblk, L, nblk, L)
        return jnp.einsum("ul,rltm,vm->rtuv", P, S4, P)

    def point_aux(self, s):
        Ss, Qts, S11s, q11s = [], [], [], []
        for P in self.Ps:
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            Arr = self._arrow(lams)
            La = linalg.cholesky(Arr)
            eye = jnp.eye(Arr.shape[0], dtype=Arr.dtype)
            Las = jnp.where(jnp.isfinite(La), La, eye)
            Li = linalg.tri_inverse(Las)
            S = Li.T @ Li
            L11 = linalg.cholesky(lams[0])
            eye1 = jnp.eye(lams[0].shape[0], dtype=lams[0].dtype)
            L11s_ = jnp.where(jnp.isfinite(L11), L11, eye1)
            Li11 = linalg.tri_inverse(L11s_)
            S11 = Li11.T @ Li11
            Ss.append(S)
            S11s.append(S11)
            Qts.append(self._q_tensor(Pj, S, self.R))
            q11s.append(Pj @ S11 @ Pj.T)
        aux = {"Ss": Ss, "Qts": Qts, "S11s": S11s, "q11s": q11s}
        H = self.hess(None, aux)
        Lh, hok = linalg.cholesky_shifted(H)
        aux.update({"hess": H, "hess_chol": Lh, "hess_chol_ok": hok,
                    "hess_inv": linalg.chol_inverse(Lh)})
        return aux

    def _get_aux(self, s, aux):
        if aux is None or "Qts" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        terms = self._terms()
        c = self.R - 2
        g = jnp.zeros(self.dim, dtype=s.dtype)
        for Qt, q11 in zip(aux["Qts"], aux["q11s"]):
            parts = [_ld_grad(Qt, t) for t in terms]
            parts[0] = parts[0] + c * jnp.diagonal(q11)
            g = g + jnp.concatenate(parts)
        return g

    def hess(self, s, aux=None):
        aux = self._get_aux(s, aux)
        if "hess" in aux:
            return aux["hess"]
        terms = self._terms()
        c = self.R - 2
        dt = jnp.real(aux["Qts"][0]).dtype
        H = jnp.zeros((self.dim, self.dim), dtype=dt)
        for Qt, q11 in zip(aux["Qts"], aux["q11s"]):
            rows = []
            for ti, tx in enumerate(terms):
                row = []
                for tj, ty in enumerate(terms):
                    blk = _ld_hess_block(Qt, tx, ty)
                    if ti == 0 and tj == 0:
                        blk = blk - c * q11 * q11
                    row.append(blk)
                rows.append(jnp.concatenate(row, axis=1))
            H = H + jnp.concatenate(rows, axis=0)
        return H

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        return self.hess(s, aux) @ arr

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
        aux = self._get_aux(s, aux)
        terms = self._terms()
        c = self.R - 2
        U = self.U
        out = jnp.zeros(self.dim, dtype=s.dtype)
        for P, S, S11 in zip(self.Ps, aux["Ss"], aux["S11s"]):
            Pj = _P_as(P, d)
            L = Pj.shape[1]
            dlams = self._lams(d, Pj)
            D = self._arrow(dlams)
            M = S @ D @ S @ D @ S
            M4 = M.reshape(self.R, L, self.R, L)
            parts = [_ld_dder3(Pj, M4, t) for t in terms]
            m11 = S11 @ dlams[0] @ S11 @ dlams[0] @ S11
            parts[0] = parts[0] - c * jnp.diagonal(Pj @ m11 @ Pj.T)
            out = out + jnp.concatenate(parts)
        return out


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
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            L11 = linalg.cholesky(lams[0])
            out -= 2 * jnp.sum(jnp.log(jnp.diagonal(L11)))
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11, lam_r)
                schur = lams[0] - lam_r @ X
                Ls = linalg.cholesky((schur + schur.T) / 2)
                out -= 2 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
        return out

    def feas(self, s):
        ok = jnp.asarray(True)
        for P in self.Ps:
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            L11 = linalg.cholesky(lams[0])
            ok = ok & jnp.all(jnp.isfinite(L11))
            L11s = jnp.where(jnp.isfinite(L11), L11,
                             jnp.eye(L11.shape[0], dtype=L11.dtype))
            for lam_r in lams[1:]:
                X = linalg.cho_solve(L11s, lam_r)
                schur = lams[0] - lam_r @ X
                Ls = linalg.cholesky((schur + schur.T) / 2)
                ok = ok & jnp.all(jnp.isfinite(Ls))
        return ok

    # -- closed-form oracles (`wsosinterpepinormone.jl:130-493`) -----------
    #
    # barrier = -sum_{r>=2} logdet(Arr2_r(s)) + (R-2) logdet(Lam_11(s)),
    # Arr2_r = [[Lam_11, Lam_r], [Lam_r, Lam_11]] linear in (p_1, p_r):
    # each -logdet(Arr2_r) = -logdet(Lam_11 - Lam_r Lam_11^-1 Lam_r)
    # - logdet(Lam_11).  Q-tensor identities per 2x2 arrow.

    _DIAG_TERMS = ((0, 0, 0.5), (1, 1, 0.5))
    _EDGE_TERMS = ((0, 1, 1.0),)

    def _arrow2(self, lam0, lamr):
        L = lam0.shape[0]
        Arr = jnp.zeros((2 * L, 2 * L), dtype=lam0.dtype)
        Arr = Arr.at[:L, :L].set(lam0)
        Arr = Arr.at[L:, L:].set(lam0)
        Arr = Arr.at[:L, L:].set(lamr)
        Arr = Arr.at[L:, :L].set(lamr)
        return Arr

    def _q_tensor2(self, P, S):
        L = P.shape[1]
        S4 = S.reshape(2, L, 2, L)
        return jnp.einsum("ul,rltm,vm->rtuv", P, S4, P)

    def point_aux(self, s):
        Srs, Qtrs, S11s, q11s = [], [], [], []
        for P in self.Ps:
            Pj = _P_as(P, s)
            lams = self._lams(s, Pj)
            eye2 = jnp.eye(2 * lams[0].shape[0], dtype=lams[0].dtype)
            eye1 = jnp.eye(lams[0].shape[0], dtype=lams[0].dtype)
            Sr_k, Qt_k = [], []
            for lam_r in lams[1:]:
                Arr = self._arrow2(lams[0], lam_r)
                La = linalg.cholesky(Arr)
                Las = jnp.where(jnp.isfinite(La), La, eye2)
                Li = linalg.tri_inverse(Las)
                S = Li.T @ Li
                Sr_k.append(S)
                Qt_k.append(self._q_tensor2(Pj, S))
            L11 = linalg.cholesky(lams[0])
            L11s_ = jnp.where(jnp.isfinite(L11), L11, eye1)
            Li11 = linalg.tri_inverse(L11s_)
            S11 = Li11.T @ Li11
            Srs.append(Sr_k)
            Qtrs.append(Qt_k)
            S11s.append(S11)
            q11s.append(Pj @ S11 @ Pj.T)
        aux = {"Srs": Srs, "Qtrs": Qtrs, "S11s": S11s, "q11s": q11s}
        H = self.hess(None, aux)
        Lh, hok = linalg.cholesky_shifted(H)
        aux.update({"hess": H, "hess_chol": Lh, "hess_chol_ok": hok,
                    "hess_inv": linalg.chol_inverse(Lh)})
        return aux

    def _get_aux(self, s, aux):
        if aux is None or "Qtrs" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        c = self.R - 2
        g = jnp.zeros(self.dim, dtype=s.dtype)
        for Qt_k, q11 in zip(aux["Qtrs"], aux["q11s"]):
            g0 = c * jnp.diagonal(q11)
            parts = []
            for Qt in Qt_k:
                g0 = g0 + _ld_grad(Qt, self._DIAG_TERMS)
                parts.append(_ld_grad(Qt, self._EDGE_TERMS))
            g = g + jnp.concatenate([g0] + parts)
        return g

    def hess(self, s, aux=None):
        aux = self._get_aux(s, aux)
        if "hess" in aux:
            return aux["hess"]
        U = self.U
        c = self.R - 2
        dt = jnp.real(aux["Qtrs"][0][0]).dtype
        H = jnp.zeros((self.dim, self.dim), dtype=dt)
        for Qt_k, q11 in zip(aux["Qtrs"], aux["q11s"]):
            Hk = jnp.zeros((self.dim, self.dim), dtype=dt)
            H00 = -c * q11 * q11
            for ri, Qt in enumerate(Qt_k):
                H00 = H00 + _ld_hess_block(Qt, self._DIAG_TERMS,
                                           self._DIAG_TERMS)
                H0r = _ld_hess_block(Qt, self._DIAG_TERMS, self._EDGE_TERMS)
                Hrr = _ld_hess_block(Qt, self._EDGE_TERMS, self._EDGE_TERMS)
                r0 = (ri + 1) * U
                Hk = Hk.at[:U, r0:r0 + U].set(H0r)
                Hk = Hk.at[r0:r0 + U, :U].set(H0r.T)
                Hk = Hk.at[r0:r0 + U, r0:r0 + U].set(Hrr)
            Hk = Hk.at[:U, :U].set(H00)
            H = H + Hk
        return H

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        return self.hess(s, aux) @ arr

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
        aux = self._get_aux(s, aux)
        c = self.R - 2
        out = jnp.zeros(self.dim, dtype=s.dtype)
        for P, Sr_k, S11 in zip(self.Ps, aux["Srs"], aux["S11s"]):
            Pj = _P_as(P, d)
            L = Pj.shape[1]
            dlams = self._lams(d, Pj)
            m11 = S11 @ dlams[0] @ S11 @ dlams[0] @ S11
            p0 = -c * jnp.diagonal(Pj @ m11 @ Pj.T)
            parts = []
            for ri, S in enumerate(Sr_k):
                D = self._arrow2(dlams[0], dlams[ri + 1])
                M = S @ D @ S @ D @ S
                M4 = M.reshape(2, L, 2, L)
                p0 = p0 + _ld_dder3(Pj, M4, self._DIAG_TERMS)
                parts.append(_ld_dder3(Pj, M4, self._EDGE_TERMS))
            out = out + jnp.concatenate([p0] + parts)
        return out
