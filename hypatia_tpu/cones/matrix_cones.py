"""Matrix cones over svec-packed symmetric/Hermitian variables.

- PosSemidefTri        (`possemideftri.jl`): closed-form Cholesky oracles
- DoublyNonnegativeTri (`doublynonnegativetri.jl`)
- LinMatrixIneq        (`linmatrixineq.jl`)
- HypoRootdetTri       (`hyporootdettri.jl`): stable ZetaCone oracles
- HypoPerLogdetTri     (`hypoperlogdettri.jl`): stable ZetaCone oracles
- EpiNormSpectral      (`epinormspectral.jl`)
- MatrixEpiPerSquare   (`matrixepipersquare.jl`)

All heavy per-point work is Cholesky factorization + triangular solves +
matmuls — the natural MXU/TPU path. Complex Hermitian variants store
matrices as real svec vectors of dim side^2 (`arrayutilities.jl:81`).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.cones.zetacone import ZetaCone
from hypatia_tpu.cones.centralray import solve_central_ray
from hypatia_tpu.ops import linalg
from hypatia_tpu.ops.svec import (
    smat_to_svec, svec_to_smat, herm_to_svec, svec_to_herm, svec_length,
    svec_side, _svec_indices, _herm_svec_indices,
)


def _eps(x):
    return jnp.finfo(x.dtype).eps


def _chol_logdet(L):
    """2 sum log diag(chol) — differentiable logdet without LU (f64-TPU safe)."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2 * jnp.sum(jnp.log(jnp.real(d)))


class _MatrixMixin:
    """svec<->smat helpers switching on real/complex."""

    def params_key(self):
        return (self.is_complex,)

    def _setup_matrix(self, w_len, is_complex):
        self.is_complex = bool(is_complex)
        if self.is_complex:
            self.side = int(round(np.sqrt(w_len)))
            assert self.side**2 == w_len
        else:
            self.side = svec_side(w_len)

    def _smat(self, v):
        return svec_to_herm(v) if self.is_complex else svec_to_smat(v)

    def _svec(self, W):
        return herm_to_svec(W) if self.is_complex else smat_to_svec(W)

    def _diag_svec_idxs(self, w_len):
        if self.is_complex:
            kind, rows, cols = _herm_svec_indices(self.side)
            return np.nonzero(kind == 0)[0]
        rows, cols, is_diag = _svec_indices(self.side)
        return np.nonzero(is_diag)[0]

    def _svec_sym(self, Y):
        return self._svec((Y + Y.conj().T) / 2)

    def _two_sided(self, M, arr):
        """svec-operator (M (x) M) @ arr columnwise: B -> M smat(B) M."""
        one = lambda col: self._svec_sym(M @ self._smat(col) @ M)
        if arr.ndim == 1:
            return one(arr)
        return jax.vmap(one, in_axes=1, out_axes=1)(arr)

    @staticmethod
    def _rank1(sv, proj):
        return sv[:, None] * proj[None, :] if proj.ndim else sv * proj


def _psd_feas(W):
    L = linalg.cholesky(W)
    return jnp.all(jnp.isfinite(jnp.real(L))), L


class PosSemidefTri(_MatrixMixin, Cone):
    """PSD cone in svec coordinates, barrier -logdet(W), nu = side
    (`possemideftri.jl:1-90`). Oracles are exact two-sided Cholesky solves:
    H[A] = W^-1 A W^-1, Hi[A] = W A W, sqrt[A] = L^-1 A L^-T."""

    has_sqrt_oracles = True

    def __init__(self, dim: int, is_complex: bool = False,
                 use_dual: bool = False):
        super().__init__(dim, use_dual)
        self._setup_matrix(dim, is_complex)

    @property
    def nu(self):
        return self.side

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[self._diag_svec_idxs(self.dim)] = 1.0
        return pt

    def barrier(self, s):
        L = linalg.cholesky(self._smat(s))
        return -_chol_logdet(L)

    def feas(self, s):
        ok, _ = _psd_feas(self._smat(s))
        return ok

    def dual_feas(self, z):
        ok, _ = _psd_feas(self._smat(z))
        return ok

    def point_aux(self, s):
        W = self._smat(s)
        L = linalg.cholesky(W)
        eye = jnp.eye(self.side, dtype=W.dtype)
        Li = linalg.tri_inverse(L)
        Winv = Li.conj().T @ Li
        return {"W": W, "L": L, "Winv": Winv}

    def _get_aux(self, s, aux):
        if aux is None or "L" not in aux:
            return self.point_aux(s)
        return aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        return -self._svec(aux["Winv"])

    def _per_col(self, arr, fn):
        if arr.ndim == 1:
            return fn(arr)
        return jax.vmap(fn, in_axes=1, out_axes=1)(arr)

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        Winv = aux["Winv"]

        def one(col):
            A = self._smat(col)
            Y = Winv @ A @ Winv
            return self._svec((Y + Y.conj().T) / 2)

        return self._per_col(arr, one)

    def inv_hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        W = aux["W"]

        def one(col):
            A = self._smat(col)
            Y = W @ A @ W
            return self._svec((Y + Y.conj().T) / 2)

        return self._per_col(arr, one)

    def sqrt_hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        L = aux["L"]

        def one(col):
            A = self._smat(col)
            X = linalg.solve_tri(L, A, lower=True)
            Y = linalg.solve_tri(L, X.conj().T, lower=True).conj().T
            return self._svec((Y + Y.conj().T) / 2)

        return self._per_col(arr, one)

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        # Ubar[A] = L' A L gives Ubar' Ubar [A] = (LL')A(LL') = W A W =
        # H^-1[A] — the Gram convention the syrk Schur assembly needs
        # (L A L' would round-trip sqrt_hess_prod but has the wrong Gram)
        aux = self._get_aux(s, aux)
        L = aux["L"]

        def one(col):
            A = self._smat(col)
            Y = L.conj().T @ A @ L
            return self._svec((Y + Y.conj().T) / 2)

        return self._per_col(arr, one)

    def dder3(self, s, d, aux=None):
        aux = self._get_aux(s, aux)
        Winv = aux["Winv"]
        D = self._smat(d)
        X = Winv @ D
        Z = X @ X @ Winv                   # W^-1 D W^-1 D W^-1
        return self._svec((Z + Z.conj().T) / 2)


class DoublyNonnegativeTri(Cone):
    """PSD and entrywise nonnegative, svec coords; barrier
    -logdet(W) - sum log(offdiag svec entries), nu = dim
    (`doublynonnegativetri.jl:1-80`). Real symmetric only."""

    def __init__(self, dim: int, use_dual: bool = False):
        super().__init__(dim, use_dual)
        self.side = svec_side(dim)
        rows, cols, is_diag = _svec_indices(self.side)
        self.offdiag_idxs = np.nonzero(~is_diag)[0]
        self.diag_idxs = np.nonzero(is_diag)[0]

    @property
    def nu(self):
        return self.dim

    def barrier(self, s):
        L = linalg.cholesky(svec_to_smat(s))
        offd = s[self.offdiag_idxs]
        return -_chol_logdet(L) - jnp.sum(jnp.log(offd))

    def feas(self, s):
        ok_pos = jnp.all(s > _eps(s))
        ok_psd, _ = _psd_feas(svec_to_smat(s))
        return ok_pos & ok_psd

    def init_point(self):
        if self.side == 1:
            return np.ones(1)
        red = self._central_ray()
        pt = np.zeros(self.dim)
        pt[self.diag_idxs] = red[0]
        pt[self.offdiag_idxs] = red[1]
        return pt

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        diag_idxs, offdiag_idxs, dim = (self.diag_idxs, self.offdiag_idxs,
                                        self.dim)

        def expand(red):
            pt = np.zeros(dim)
            pt[diag_idxs] = red[0]
            pt[offdiag_idxs] = red[1]
            return pt

        return solve_central_ray(self.barrier, expand, 2,
                                 np.array([np.sqrt(5.0) / 2, 0.5]))


class LinMatrixIneq(Cone):
    """{w : sum_i w_i A_i > 0} for given symmetric/Hermitian As with A_1 > 0;
    barrier -logdet(sum w_i A_i), nu = side (`linmatrixineq.jl:1-90`)."""

    def __init__(self, As, use_dual: bool = False):
        As = [np.asarray(A) for A in As]
        side = As[0].shape[0]
        for A in As:
            assert A.shape == (side, side)
        super().__init__(len(As), use_dual)
        self.side = side
        self.As = np.stack(As)  # (dim, side, side), possibly complex

    def params_key(self):
        return (self.As.tobytes(),)

    @property
    def nu(self):
        return self.side

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[0] = 1.0
        return pt

    def _pencil(self, s):
        As = jnp.asarray(self.As)
        return jnp.tensordot(s.astype(As.real.dtype), As, axes=1)

    def barrier(self, s):
        L = linalg.cholesky(self._pencil(s))
        return -_chol_logdet(L)

    def feas(self, s):
        ok, _ = _psd_feas(self._pencil(s))
        return ok


class HypoRootdetTri(_MatrixMixin, ZetaCone):
    """(u, W): u <= det(W)^(1/d), W PSD; barrier -log(det(W)^(1/d) - u)
    - logdet(W), nu = 1 + d (`hyporootdettri.jl:1-70`).
    Stable oracles via ZetaCone over svec coordinates."""

    sgn = -1.0

    def __init__(self, dim: int, is_complex: bool = False,
                 use_dual: bool = False):
        super().__init__(dim, use_dual)
        self._setup_matrix(dim - 1, is_complex)
        self.d = self.side

    @property
    def nu(self):
        return 1 + self.d

    def xi(self, w):
        L = linalg.cholesky(self._smat(w))
        return jnp.exp(_chol_logdet(L) / self.d)

    def phi(self, w):
        L = linalg.cholesky(self._smat(w))
        return -_chol_logdet(L)

    has_closed_Mw = True

    def point_aux(self, s):
        """Structured Mw: hess(xi) = (phi/d^2) vv' - (phi/d) Winv (x) Winv
        with v = svec(W^-1), so Mw = hess(phi) - hess(xi)/zeta is

            Mw = coeff * Winv(x)Winv - beta * vv',
            coeff = 1 + phi/(d zeta),  beta = phi/(d^2 zeta).

        Never materialized: Mw_prod is a two-sided product and Mw_solve is
        Sherman-Morrison with (Winv(x)Winv)^-1[B] = W B W and the identity
        coeff - beta*d = 1, so Mw^-1[R] = (W R W + beta*<svec W, r>*W)/coeff.
        Replaces the O(d^5)-flop materialized svec operator + O(n^3) chol
        per point (`possemideftri.jl:126-195`-style product oracles)."""
        u, w = s[0], s[1:]
        W = self._smat(w)
        Lc = linalg.cholesky(W)
        d = self.d
        phi = jnp.exp(2 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(Lc)))) / d)
        zeta = phi - u
        eye = jnp.eye(self.side, dtype=W.dtype)
        Li = linalg.tri_inverse(Lc)
        Winv = Li.conj().T @ Li
        winv_svec = self._svec(Winv)
        coeff = 1.0 + phi / (d * zeta)
        beta = phi / (d * d * zeta)
        grad_xi = (phi / d) * winv_svec
        a = self.sgn / zeta
        b = -self.sgn * grad_xi / zeta
        return {"zeta": zeta, "a": a, "b": b, "W": W, "Winv": Winv,
                "coeff": coeff, "beta": beta,
                "Mw_ok": linalg.chol_ok(Lc), "grad_phi": -winv_svec}

    def Mw_prod(self, aux, arr):
        v = aux["Winv"]
        sv = self._svec(v)
        return (aux["coeff"] * self._two_sided(v, arr)
                - aux["beta"] * self._rank1(sv, sv @ arr))

    def Mw_solve(self, aux, arr):
        W = aux["W"]
        sw = self._svec(W)
        return (self._two_sided(W, arr)
                + aux["beta"] * self._rank1(sw, sw @ arr)) / aux["coeff"]

    def feas(self, s):
        ok, L = _psd_feas(self._smat(s[1:]))
        logdet = _chol_logdet(jnp.where(jnp.isfinite(jnp.real(L)), L,
                                        jnp.eye(self.side, dtype=L.dtype)))
        phi = jnp.exp(logdet / self.d)
        return ok & (phi - s[0] > _eps(s))

    def dual_feas(self, z):
        u = z[0]
        ok, L = _psd_feas(self._smat(z[1:]))
        safe_L = jnp.where(jnp.isfinite(jnp.real(L)), L,
                           jnp.eye(self.side, dtype=L.dtype))
        u_safe = jnp.where(u < 0, u, -1.0)
        val = _chol_logdet(safe_L) - self.d * jnp.log(-u_safe / self.d)
        return (u < -_eps(z)) & ok & (val > _eps(z))

    def init_point(self):
        red = self._central_ray()
        pt = np.zeros(self.dim)
        pt[0] = red[0]
        pt[1 + self._diag_svec_idxs(self.dim - 1)] = red[1]
        return pt

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        dim = self.dim
        diag = 1 + self._diag_svec_idxs(dim - 1)

        def expand(red):
            pt = np.zeros(dim)
            pt[0] = red[0]
            pt[diag] = red[1]
            return pt

        return solve_central_ray(self.barrier, expand, 2,
                                 np.array([-1.0, 1.5]))


class HypoPerLogdetTri(_MatrixMixin, ZetaCone):
    """(u, v, W): u <= v logdet(W/v); barrier -log(v logdet(W/v) - u)
    - logdet(W) - log(v), nu = d + 2 (`hypoperlogdettri.jl:1-70`).
    Stable oracles via ZetaCone with wbar = (v, svec W)."""

    sgn = -1.0

    def __init__(self, dim: int, is_complex: bool = False,
                 use_dual: bool = False):
        super().__init__(dim, use_dual)
        self._setup_matrix(dim - 2, is_complex)
        self.d = self.side

    @property
    def nu(self):
        return self.d + 2

    def xi(self, wbar):
        v, w = wbar[0], wbar[1:]
        L = linalg.cholesky(self._smat(w))
        return v * (_chol_logdet(L) - self.d * jnp.log(v))

    def phi(self, wbar):
        v, w = wbar[0], wbar[1:]
        L = linalg.cholesky(self._smat(w))
        return -_chol_logdet(L) - jnp.log(v)

    has_closed_Mw = True

    def point_aux(self, s):
        """Structured arrow Mw over wbar = (v, svec W): hess(xi) has
        WW block -v Winv(x)Winv, vW border svec(W^-1), vv -d/v; with
        hess(phi) = blkdiag(1/v^2, Winv(x)Winv):

            Mw = [ mvv   mvw' ]   mvv = 1/v^2 + d/(v zeta)
                 [ mvw  cw*Kw ]   mvw = -svec(Winv)/zeta, cw = 1 + v/zeta

        Kw = Winv(x)Winv is never materialized: Mw_prod applies two-sided
        products, Mw_solve does arrow block elimination with
        Kw^-1[B] = W B W and the cancellation-free Schur scalar
        mvv - d/(cw zeta^2) = 1/v^2 + d/(v (zeta + v)) > 0."""
        u, v, w = s[0], s[1], s[2:]
        W = self._smat(w)
        Lc = linalg.cholesky(W)
        d = self.d
        logdet = 2 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(Lc))))
        xi = v * (logdet - d * jnp.log(v))
        zeta = xi - u
        eye = jnp.eye(self.side, dtype=W.dtype)
        Li = linalg.tri_inverse(Lc)
        Winv = Li.conj().T @ Li
        winv_svec = self._svec(Winv)
        cw = 1.0 + v / zeta
        mvv = 1.0 / v**2 + d / (v * zeta)
        schur = 1.0 / v**2 + d / (v * (zeta + v))
        grad_xi = jnp.concatenate([
            (logdet - d * jnp.log(v) - d)[None], v * winv_svec])
        a = self.sgn / zeta
        b = -self.sgn * grad_xi / zeta
        grad_phi = jnp.concatenate([(-1.0 / v)[None], -winv_svec])
        return {"zeta": zeta, "a": a, "b": b, "W": W, "Winv": Winv,
                "cw": cw, "mvv": mvv, "schur": schur,
                "Mw_ok": linalg.chol_ok(Lc), "grad_phi": grad_phi}

    def Mw_prod(self, aux, arr):
        zeta, cw = aux["zeta"], aux["cw"]
        mvw = -self._svec(aux["Winv"]) / zeta
        rv, rw = arr[0], arr[1:]
        out_v = aux["mvv"] * rv + mvw @ rw
        out_w = self._rank1(mvw, rv) + cw * self._two_sided(aux["Winv"], rw)
        return jnp.concatenate([out_v[None], out_w], axis=0)

    def Mw_solve(self, aux, arr):
        zeta, cw = aux["zeta"], aux["cw"]
        W = aux["W"]
        mvw = -self._svec(aux["Winv"]) / zeta
        # Kw^-1 mvw = -svec(W)/zeta, so (cw*Kw)^-1 mvw = -svec(W)/(cw*zeta)
        mhat = -self._svec(W) / (cw * zeta)
        rv, rw = arr[0], arr[1:]
        xw0 = self._two_sided(W, rw) / cw
        xv = (rv - mvw @ xw0) / aux["schur"]
        xw = xw0 - self._rank1(mhat, xv)
        return jnp.concatenate([xv[None], xw], axis=0)

    def feas(self, s):
        u, v, w = s[0], s[1], s[2:]
        ok_psd, L = _psd_feas(self._smat(w))
        ok = (v > _eps(s)) & ok_psd
        v_safe = jnp.where(v > 0, v, 1.0)
        safe_L = jnp.where(jnp.isfinite(jnp.real(L)), L,
                           jnp.eye(self.side, dtype=L.dtype))
        zeta = v_safe * (_chol_logdet(safe_L)
                         - self.d * jnp.log(v_safe)) - u
        return ok & (zeta > _eps(s))

    def dual_feas(self, z):
        u, v, w = z[0], z[1], z[2:]
        ok_psd, L = _psd_feas(self._smat(w))
        ok = (u < -_eps(z)) & ok_psd
        u_safe = jnp.where(u < 0, u, -1.0)
        safe_L = jnp.where(jnp.isfinite(jnp.real(L)), L,
                           jnp.eye(self.side, dtype=L.dtype))
        val = v - u * (_chol_logdet(safe_L) + self.d * (1 - jnp.log(-u_safe)))
        return ok & (val > _eps(z))

    def init_point(self):
        red = self._central_ray()
        pt = np.zeros(self.dim)
        pt[0], pt[1] = red[0], red[1]
        pt[2 + self._diag_svec_idxs(self.dim - 2)] = red[2]
        return pt

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        dim = self.dim
        diag = 2 + self._diag_svec_idxs(dim - 2)

        def expand(red):
            pt = np.zeros(dim)
            pt[0], pt[1] = red[0], red[1]
            pt[diag] = red[2]
            return pt

        return solve_central_ray(self.barrier, expand, 3,
                                 np.array([-1.0, 1.0, 2.0]))


class _SpectralMixin:
    """Shared helpers for cones over rectangular W (d1 x d2, d1 <= d2),
    stored column-major vec (real) or interleaved re/im (complex)."""

    def _setup_rect(self, d1, d2, is_complex):
        self.d1, self.d2 = d1, d2
        self.is_complex = bool(is_complex)
        self.w_len = d1 * d2 * (2 if is_complex else 1)

    def _wmat(self, wvec):
        if self.is_complex:
            re = wvec[0::2].reshape(self.d2, self.d1).T
            im = wvec[1::2].reshape(self.d2, self.d1).T
            return re + 1j * im
        return wvec.reshape(self.d2, self.d1).T

    def _wvec(self, W):
        if self.is_complex:
            flat = W.T
            out = jnp.zeros(self.w_len, dtype=jnp.real(W).dtype)
            out = out.at[0::2].set(jnp.real(flat).reshape(-1))
            out = out.at[1::2].set(jnp.imag(flat).reshape(-1))
            return out
        return W.T.reshape(-1)


class EpiNormSpectral(_SpectralMixin, Cone):
    """(u, W): u >= sigma_max(W); barrier -logdet(u^2 I - W W')
    + (d1-1) log u, nu = d1 + 1 (`epinormspectral.jl:1-60`).
    Dual cone: nuclear norm epigraph."""

    def __init__(self, d1: int, d2: int, is_complex: bool = False,
                 use_dual: bool = False):
        assert 1 <= d1 <= d2
        self._setup_rect(d1, d2, is_complex)
        super().__init__(1 + self.w_len, use_dual)

    @property
    def nu(self):
        return self.d1 + 1

    def init_point(self):
        pt = np.zeros(self.dim)
        pt[0] = np.sqrt(self.nu)
        return pt

    def barrier(self, s):
        u, W = s[0], self._wmat(s[1:])
        Z = u * u * jnp.eye(self.d1, dtype=W.dtype) - W @ W.conj().T
        L = linalg.cholesky(Z)
        return -_chol_logdet(L) + (self.d1 - 1) * jnp.log(u)

    def feas(self, s):
        u, W = s[0], self._wmat(s[1:])
        Z = u * u * jnp.eye(self.d1, dtype=W.dtype) - W @ W.conj().T
        ok, _ = _psd_feas(Z)
        return (u > _eps(s)) & ok

    def dual_feas(self, z):
        u, W = z[0], self._wmat(z[1:])
        sq = jnp.linalg.eigvalsh(W @ W.conj().T)
        nuc = jnp.sum(jnp.sqrt(jnp.maximum(sq, 0.0)))
        return (u > _eps(z)) & (u - nuc > _eps(z))


class MatrixEpiPerSquare(_SpectralMixin, Cone):
    """(U, v, W): U >= W W' / (2v), v >= 0; barrier
    -logdet(2 v U - W W') + (d1-1) log v, nu = d1 + 1
    (`matrixepipersquare.jl:1-70`). Layout (svec U, v, vec W)."""

    def __init__(self, d1: int, d2: int, is_complex: bool = False,
                 use_dual: bool = False):
        assert 1 <= d1
        self._setup_rect(d1, d2, is_complex)
        self.u_len = d1 * d1 if is_complex else svec_length(d1)
        super().__init__(self.u_len + 1 + self.w_len, use_dual)
        self.side = d1

    @property
    def nu(self):
        return self.d1 + 1

    def _usmat(self, uvec):
        return svec_to_herm(uvec) if self.is_complex else svec_to_smat(uvec)

    def init_point(self):
        pt = np.zeros(self.dim)
        if self.is_complex:
            kind, rows, cols = _herm_svec_indices(self.d1)
            diag = np.nonzero(kind == 0)[0]
        else:
            rows, cols, is_diag = _svec_indices(self.d1)
            diag = np.nonzero(is_diag)[0]
        pt[diag] = 1.0
        pt[self.u_len] = 1.0
        return pt

    def _Z(self, s):
        U = self._usmat(s[:self.u_len])
        v = s[self.u_len]
        W = self._wmat(s[self.u_len + 1:])
        return 2 * v * U - W @ W.conj().T, v

    def barrier(self, s):
        Z, v = self._Z(s)
        L = linalg.cholesky(Z)
        return -_chol_logdet(L) + (self.d1 - 1) * jnp.log(v)

    def feas(self, s):
        Z, v = self._Z(s)
        ok, _ = _psd_feas(Z)
        return (v > _eps(s)) & ok

    def dual_feas(self, z):
        U = self._usmat(z[:self.u_len])
        v = z[self.u_len]
        W = self._wmat(z[self.u_len + 1:])
        ok_psd, L = _psd_feas(U)
        safe_L = jnp.where(jnp.isfinite(jnp.real(L)), L,
                           jnp.eye(self.d1, dtype=L.dtype))
        LW = linalg.solve_tri(safe_L, W, lower=True)
        tr = jnp.sum(jnp.abs(LW) ** 2)
        return (v > _eps(z)) & ok_psd & (2 * v - tr > _eps(z))
