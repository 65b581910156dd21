"""Quantum (trace) relative entropy cone.

(u, V, W): u >= tr(W log W - W log V), V, W PSD; layout (u, svec V, svec W);
nu = 2d + 1.  Barrier -log(u - tr(W log W - W log V)) - logdet V - logdet W.

Parity: `src/Cones/epitrrelentropytri.jl` (double eigendecomposition +
first/second divided-difference tensors).  Oracles use the stable zeta-form
block elimination: only the well-conditioned

    Mw = hess(phi) + hess(xi)/zeta

over (svec V, svec W) is factored, assembled from Daleckii-Krein formulas:
- WW block:   Dlog(W) Hadamard pattern in W's eigenbasis
- VW block:   -Dlog(V) (same operator both cross blocks)
- VV block:   -(second divided differences of log at eig(V), weighted by W)

The third-order oracle is the base-class jvp of this closed-form Hessian
product (one forward-AD level through the guarded divided differences —
validated exact against second-order barrier AD and the <dder3(d),s> =
d'Hd / dder3(s) = -g identities at generic points; the reference's
explicit third-divided-difference assembly is
`epitrrelentropytri.jl:286-383`). At exactly-degenerate eigenvalues the
jvp yields NaN and the stepper's dder3 identity gate (same check as the
reference's) zeroes that cone's adjustment for the iteration.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.cones.centralray import solve_central_ray
from hypatia_tpu.ops import linalg, spectral
from hypatia_tpu.ops.svec import (
    smat_to_svec, svec_to_smat, herm_to_svec, svec_to_herm, svec_length,
    svec_side, _svec_indices, _herm_svec_indices,
)


def _eps(x):
    return jnp.finfo(x.dtype).eps


def _log_fdd1(lam):
    return spectral.fdd1(jnp.log(lam), 1.0 / lam, lam)


def _log_fdd2(lam):
    return spectral.fdd2_tensor(jnp.log(lam), 1.0 / lam, -lam**-2.0, lam)


class EpiTrRelEntropyTri(Cone):
    has_dder3 = True  # base-class jvp over the closed-form hess_prod

    def __init__(self, dim: int, is_complex: bool = False,
                 use_dual: bool = False):
        super().__init__(dim, use_dual)
        self.is_complex = bool(is_complex)
        w_len = (dim - 1) // 2
        assert 2 * w_len + 1 == dim
        self.w_len = w_len
        if is_complex:
            self.side = int(round(np.sqrt(w_len)))
            assert self.side**2 == w_len
        else:
            self.side = svec_side(w_len)
        self.d = self.side

    def params_key(self):
        return (self.is_complex,)

    @property
    def nu(self):
        return 2 * self.d + 1

    def _smat(self, v):
        return svec_to_herm(v) if self.is_complex else svec_to_smat(v)

    def _svec(self, W):
        return herm_to_svec(W) if self.is_complex else smat_to_svec(W)

    def _diag_idxs(self):
        if self.is_complex:
            kind, _, _ = _herm_svec_indices(self.side)
            return np.nonzero(kind == 0)[0]
        _, _, is_diag = _svec_indices(self.side)
        return np.nonzero(is_diag)[0]

    def _pack_sym(self, M):
        if self.is_complex:
            kind, rows, cols = _herm_svec_indices(self.side)
            return M[rows, cols]
        rows, cols, _ = _svec_indices(self.side)
        return M[rows, cols]

    def _split(self, s):
        n = self.w_len
        return s[0], s[1:1 + n], s[1 + n:]

    # -- barrier & feasibility ---------------------------------------------

    def _xi(self, V, W):
        lw = jnp.linalg.eigvalsh(W)
        lv, Qv = jnp.linalg.eigh(V)
        Wv = Qv.conj().T @ W @ Qv
        tr_WlogV = jnp.sum(jnp.real(jnp.diagonal(Wv)) * jnp.log(lv))
        return jnp.sum(lw * jnp.log(lw)) - tr_WlogV

    def barrier(self, s):
        u, v, w = self._split(s)
        V, W = self._smat(v), self._smat(w)
        lv = jnp.linalg.eigvalsh(V)
        lw = jnp.linalg.eigvalsh(W)
        zeta = u - self._xi(V, W)
        return (-jnp.log(zeta) - jnp.sum(jnp.log(lv))
                - jnp.sum(jnp.log(lw)))

    def feas(self, s):
        u, v, w = self._split(s)
        V, W = self._smat(v), self._smat(w)
        lv = jnp.linalg.eigvalsh(V)
        lw = jnp.linalg.eigvalsh(W)
        ok = jnp.all(lv > _eps(s)) & jnp.all(lw > _eps(s))
        Vs = jnp.where(ok, V, jnp.eye(self.side, dtype=V.dtype))
        Ws = jnp.where(ok, W, jnp.eye(self.side, dtype=W.dtype))
        return ok & (u - self._xi(Vs, Ws) > _eps(s))

    def init_point(self):
        red = self._central_ray()
        pt = np.zeros(self.dim)
        pt[0] = red[0]
        diag = self._diag_idxs()
        pt[1 + diag] = red[1]
        pt[1 + self.w_len + diag] = red[2]
        return pt

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        # diagonal restriction: the barrier over (u, diag a, diag b) is the
        # vector trace-relative-entropy barrier; per-coordinate expansion
        # gives the correct full-space central-ray condition
        d = self.d

        def barrier_vec(s):
            u, a, b = s[0], s[1:1 + d], s[1 + d:]
            zeta = u - jnp.sum(b * jnp.log(b) - b * jnp.log(a))
            return (-jnp.log(zeta) - jnp.sum(jnp.log(a))
                    - jnp.sum(jnp.log(b)))

        def expand(red):
            return np.concatenate(
                [[red[0]], np.full(d, red[1]), np.full(d, red[2])])

        return solve_central_ray(barrier_vec, expand, 3,
                                 np.array([1.0, 1.0, 1.0]))

    # -- per-point state -----------------------------------------------------

    def point_aux(self, s):
        u, vvec, wvec = self._split(s)
        V, W = self._smat(vvec), self._smat(wvec)
        # high-relative-accuracy eigendecomposition: the TPU f64 eigh loses
        # the small eigenvalues of the ill-conditioned V,W near convergence
        # (cond ~ 1/mu), stalling the IPM at mu ~ 1e-6; two-sided Jacobi
        # (Demmel-Veselic) computes them to high relative accuracy
        if self.side <= 16:
            lv, Qv = spectral.jacobi_eigh(V)
            lw, Qw = spectral.jacobi_eigh(W)
        else:
            lv, Qv = spectral.eigh_refined(V)
            lw, Qw = spectral.eigh_refined(W)
        n = self.w_len

        Wv = Qv.conj().T @ W @ Qv  # W in V's eigenbasis
        tr_WlogV = jnp.sum(jnp.real(jnp.diagonal(Wv)) * jnp.log(lv))
        xi = jnp.sum(lw * jnp.log(lw)) - tr_WlogV
        zeta = u - xi

        Rv = spectral.svec_rotation(Qv, self._svec, self._smat, n)
        Rw = spectral.svec_rotation(Qw, self._svec, self._smat, n)

        d1v = _log_fdd1(lv)
        d1w = _log_fdd1(lw)
        f2v = _log_fdd2(lv)

        # gradient pieces
        logV = (Qv * jnp.log(lv)[None, :]) @ Qv.conj().T
        logW = (Qw * jnp.log(lw)[None, :]) @ Qw.conj().T
        eye = jnp.eye(self.side, dtype=W.dtype)
        dxi_W = logW + eye - logV
        dxi_V = -(Qv @ (d1v * Wv) @ Qv.conj().T)

        a = 1.0 / zeta
        b_v = -self._svec(dxi_V) / zeta
        b_w = -self._svec(dxi_W) / zeta

        # Mw blocks (plain svec basis), size 2n x 2n
        pack_vv_phi = self._pack_sym(1.0 / jnp.outer(lv, lv))
        pack_ww = self._pack_sym(1.0 / jnp.outer(lw, lw) + d1w / zeta)
        M_WW = Rw.T @ (pack_ww[:, None] * Rw)

        # VW cross: -(1/zeta) Dlog(V)
        pack_d1v = self._pack_sym(d1v)
        Dlogv_op = Rv.T @ (pack_d1v[:, None] * Rv)
        M_VW = -Dlogv_op / zeta

        # VV: phi part + (1/zeta) * (-T) with
        # T[B]~_ij = sum_k f2[i,k,j] (Wv_ik B~_kj + B~_ik Wv_kj)
        basis = jax.vmap(self._smat)(
            jnp.eye(n, dtype=jnp.real(W).dtype))  # (n,d,d)
        Bt = jnp.einsum("ab,nbc,cd->nad", Qv.conj().T, basis.astype(Qv.dtype),
                        Qv)
        TB = (jnp.einsum("ikj,ik,nkj->nij", f2v, Wv, Bt)
              + jnp.einsum("ikj,nik,kj->nij", f2v, Bt, Wv))
        T_cols = jax.vmap(
            lambda M: self._svec(Qv @ M @ Qv.conj().T))(TB)  # (n, n)
        T_mat = T_cols.T
        M_VV = Rv.T @ (pack_vv_phi[:, None] * Rv) - T_mat / zeta

        Mw = jnp.block([[M_VV, M_VW], [M_VW.T, M_WW]])
        Mw = (Mw + Mw.T) / 2
        Lw, ok = linalg.cholesky_shifted(Mw)
        Mw_inv = linalg.chol_inverse(Lw)

        return {"zeta": zeta, "a": a, "b": jnp.concatenate([b_v, b_w]),
                "Mw": Mw, "Mw_chol": Lw, "Mw_inv": Mw_inv, "Mw_ok": ok,
                "lv": lv, "lw": lw, "Qv": Qv, "Qw": Qw, "Wv": Wv}

    def _get_aux(self, s, aux):
        if aux is None or "Mw_chol" not in aux:
            return self.point_aux(s)
        return aux

    # -- oracles -------------------------------------------------------------

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        u, vvec, wvec = self._split(s)
        V, W = self._smat(vvec), self._smat(wvec)
        # grad F = -vdir + grad(phi) with vdir = grad(zeta)/zeta = (a, b)
        g_u = -aux["a"]
        Vi = _sym_inv(V)
        Wi = _sym_inv(W)
        g_wbar = -aux["b"] - jnp.concatenate([self._svec(Vi), self._svec(Wi)])
        return jnp.concatenate([g_u[None], g_wbar])

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        d_u, d_wbar = A[0, :], A[1:, :]
        a, b, Mw = aux["a"], aux["b"], aux["Mw"]
        vdot = a * d_u + b @ d_wbar
        H_u = a * vdot
        H_wbar = jnp.outer(b, vdot) + Mw @ d_wbar
        out = jnp.concatenate([H_u[None, :], H_wbar], axis=0)
        return out[:, 0] if one_d else out

    def hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.hess_prod(s, eye, aux)

    def inv_hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        r_u, r_wbar = A[0, :], A[1:, :]
        a, b = aux["a"], aux["b"]
        y = r_u / a
        rhs_w = r_wbar - jnp.outer(b, y)
        if "Mw_inv" in aux:
            x_wbar = aux["Mw_inv"] @ rhs_w
        else:
            x_wbar = linalg.cho_solve(aux["Mw_chol"], rhs_w)
        x_u = (y - b @ x_wbar) / a
        out = jnp.concatenate([x_u[None, :], x_wbar], axis=0)
        return out[:, 0] if one_d else out

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def dder3(self, s, d, aux=None):
        """Explicit third-order oracle -1/2 grad^3 F(s)[d, d].

        Assembled from guarded second/third divided differences of log
        (parity: `epitrrelentropytri.jl:278-383` Δ3/Δ4 path), instead of a
        jvp through the Hessian which NaNs at coincident eigenvalues.

        Derivation: F = -log ζ - logdet V - logdet W with ζ = u - ξ,
        ξ = tr(W log W) - tr(W log V).  With ν = ∇ζ/ζ = (a, b),
        c1 = <ν, d>, Ξ2 = D²ξ[d,·], Ξ3 = D³ξ[d,d,·]:

          dder3 = -Ξ3/(2ζ) + (c1/ζ)·Ξ2 + (c1² + <Ξ2,d>/(2ζ))·ν
                  + (0, svec(V⁻¹Dv V⁻¹Dv V⁻¹), svec(W⁻¹Dw W⁻¹Dw W⁻¹))
        """
        if self.is_complex:
            # complex variant keeps the jvp fallback (reference cone is
            # real-only; validated via the stepper's dder3 identity gate)
            return super().dder3(s, d, aux)
        aux = self._get_aux(s, aux)
        if "Qv" not in aux:
            aux = self.point_aux(s)
        n = self.w_len
        u_d, v_d, w_d = d[0], d[1:1 + n], d[1 + n:]
        lv, Qv, lw, Qw, Wv = (aux["lv"], aux["Qv"], aux["lw"], aux["Qw"],
                              aux["Wv"])
        zeta, a, b = aux["zeta"], aux["a"], aux["b"]

        Dv, Dw = self._smat(v_d), self._smat(w_d)
        Vd = Qv.T @ Dv @ Qv    # V-direction in V's eigenbasis
        Cw = Qv.T @ Dw @ Qv    # W-direction in V's eigenbasis
        Wd = Qw.T @ Dw @ Qw    # W-direction in W's eigenbasis

        d1v = _log_fdd1(lv)
        d1w = _log_fdd1(lw)
        f2v = _log_fdd2(lv)
        f2w = _log_fdd2(lw)
        f3v = spectral.fdd3_tensor(f2v, 2.0 * lv**-3.0, lv)

        rotV = lambda M: Qv @ M @ Qv.T
        rotW = lambda M: Qw @ M @ Qw.T

        def D2f(f2, A, B):
            # second Fréchet derivative of log in the eigenbasis:
            # M_ij = sum_k f2[i,k,j] (A_ik B_kj + B_ik A_kj)
            return (jnp.einsum("ikj,ik,kj->ij", f2, A, B)
                    + jnp.einsum("ikj,ik,kj->ij", f2, B, A))

        # Ξ2 = D²ξ[d,·]  (ξ = φ(W) − ψ(V,W), ψ = tr(W log V))
        Xi2_V = -(rotV(D2f(f2v, Vd, Wv)) + rotV(d1v * Cw))
        Xi2_W = rotW(d1w * Wd) - rotV(d1v * Vd)

        # ψ_VVV[dv,dv,·] in V's eigenbasis: gradient of
        # tr(Wv · D³log(V)[Vd,Vd,·]) via the third divided differences
        G1 = 2.0 * jnp.einsum("ikab,ik,ka,bi->ab", f3v, Vd, Vd, Wv)
        G2 = 2.0 * jnp.einsum("iabj,ia,bj,ji->ab", f3v, Vd, Vd, Wv)
        G3 = 2.0 * jnp.einsum("ablj,bl,lj,ja->ab", f3v, Vd, Vd, Wv)
        G = G1 + G2 + G3
        G = (G + G.T) / 2

        Xi3_V = -(rotV(G) + 2.0 * rotV(D2f(f2v, Vd, Cw)))
        Xi3_W = rotW(D2f(f2w, Wd, Wd)) - rotV(D2f(f2v, Vd, Vd))

        xi2v, xi2w = self._svec(Xi2_V), self._svec(Xi2_W)
        c1 = a * u_d + jnp.dot(b, d[1:])
        sig2 = jnp.dot(xi2v, v_d) + jnp.dot(xi2w, w_d)
        k1 = c1 * c1 + sig2 / (2.0 * zeta)

        # logdet parts: V⁻¹ Dv V⁻¹ Dv V⁻¹ (and W analog) via the eigenbasis
        Xv = Vd / lv[:, None] / lv[None, :]
        Tv = rotV(Xv @ (Vd / lv[None, :]))
        Xw = Wd / lw[:, None] / lw[None, :]
        Tw = rotW(Xw @ (Wd / lw[None, :]))

        bv, bw = b[:n], b[n:]
        der_u = k1 * a
        der_v = (self._svec(-Xi3_V / (2.0 * zeta) + (c1 / zeta) * Xi2_V + Tv)
                 + k1 * bv)
        der_w = (self._svec(-Xi3_W / (2.0 * zeta) + (c1 / zeta) * Xi2_W + Tw)
                 + k1 * bw)
        return jnp.concatenate([der_u[None], der_v, der_w])


def _sym_inv(M):
    L = linalg.cholesky(M)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return linalg.cho_solve(L, eye)
