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
        aux.update({"hess": H, "hess_chol": Lh, "hess_chol_ok": ok})
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
        L = aux["hess_chol"]
        one_d = arr.ndim == 1
        a = arr[:, None] if one_d else arr
        out = linalg.cho_solve(L, a)
        return out[:, 0] if one_d else out

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