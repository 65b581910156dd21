"""EpiPerSepSpectral over the PSD cone of squares (MatrixCSqr).

(u, v, W): u >= v tr h(W/v), W PSD; layout (u, v, svec W); nu = 2 + d.
Barrier -log(u - v tr h(W/v)) - log v - logdet W.

Parity: `src/Cones/epipersepspectral/matrixcsqr.jl`. Oracles use explicit
Daleckii-Krein divided-difference formulas (autodiff through eigh breaks at
degenerate eigenvalues; see ops/spectral.py). The inverse Hessian uses the
stable zeta-form block elimination with an **arrow-structured** Mw that is
diagonal in the eigenbasis-rotated svec coordinates plus a v-border — an
O(n) solve after one eigendecomposition, mirroring the reference's aux
caches (`matrixcsqr.jl:91-115`).

All heavy ops: one eigh per point + svec-basis rotations (MXU matmuls).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.cones.centralray import solve_central_ray
from hypatia_tpu.ops import spectral
from hypatia_tpu.ops.svec import (
    smat_to_svec, svec_to_smat, herm_to_svec, svec_to_herm, svec_length,
    svec_side, _svec_indices, _herm_svec_indices,
)


def _eps(x):
    return jnp.finfo(jnp.real(x).dtype).eps


class EpiPerSepSpectralMatrix(Cone):
    has_dder3 = True

    def __init__(self, h, d: int, is_complex: bool = False,
                 use_dual: bool = False):
        assert d >= 1
        self.h = h
        self.d = d
        self.is_complex = bool(is_complex)
        self.w_len = d * d if is_complex else svec_length(d)
        super().__init__(2 + self.w_len, use_dual)

    def params_key(self):
        return (repr(self.h), self.is_complex)

    def __repr__(self):
        return (f"EpiPerSepSpectralMatrix({self.h!r}, d={self.d}"
                + (", complex" if self.is_complex else "")
                + (", use_dual=True)" if self.use_dual else ")"))

    @property
    def nu(self):
        return 2 + self.d

    def _smat(self, v):
        return svec_to_herm(v) if self.is_complex else svec_to_smat(v)

    def _svec(self, W):
        return herm_to_svec(W) if self.is_complex else smat_to_svec(W)

    def _diag_idxs(self):
        if self.is_complex:
            kind, _, _ = _herm_svec_indices(self.d)
            return np.nonzero(kind == 0)[0]
        _, _, is_diag = _svec_indices(self.d)
        return np.nonzero(is_diag)[0]

    def _svec_pack_sym(self, M):
        """Pack a symmetric coefficient pattern M (d,d) into the svec-diagonal
        multiplier vector (off-diagonals appear once with the same value)."""
        if self.is_complex:
            kind, rows, cols = _herm_svec_indices(self.d)
            return M[rows, cols]
        rows, cols, _ = _svec_indices(self.d)
        return M[rows, cols]

    # -- barrier & feasibility ---------------------------------------------

    def barrier(self, s):
        u, v, w = s[0], s[1], s[2:]
        lamw = jnp.linalg.eigvalsh(self._smat(w))
        lam = lamw / v
        zeta = u - v * self.h.h_val(lam)
        return (-jnp.log(zeta) - jnp.log(v) - jnp.sum(jnp.log(lamw)))

    def feas(self, s):
        u, v, w = s[0], s[1], s[2:]
        lamw = jnp.linalg.eigvalsh(self._smat(w))
        ok = (v > _eps(s)) & jnp.all(lamw > _eps(s))
        v_safe = jnp.where(v > 0, v, 1.0)
        lam_safe = jnp.where(lamw > 0, lamw, 1.0) / v_safe
        zeta = u - v_safe * self.h.h_val(lam_safe)
        return ok & (zeta > _eps(s))

    def dual_feas(self, z):
        u, v, w = z[0], z[1], z[2:]
        lamw = jnp.linalg.eigvalsh(self._smat(w))
        ok = u > _eps(z)
        if self.h.conj_dom_pos:
            ok = ok & jnp.all(lamw > _eps(z))
            lamw = jnp.where(lamw > 0, lamw, 1.0)
        u_safe = jnp.where(u > 0, u, 1.0)
        return ok & (v - u * self.h.h_conj(lamw / u_safe) > _eps(z))

    def init_point(self):
        red = self._central_ray()
        pt = np.zeros(self.dim)
        pt[0], pt[1] = red[0], red[1]
        pt[2 + self._diag_idxs()] = red[2]
        return pt

    @functools.lru_cache(maxsize=None)
    def _central_ray(self):
        # identical to the vector-case central ray (diagonal restriction);
        # avoids autodiff through eigh at the degenerate diagonal point
        from hypatia_tpu.cones.sepspectral import EpiPerSepSpectralVector

        return EpiPerSepSpectralVector(self.h, self.d)._central_ray()

    # -- per-point state ----------------------------------------------------

    def point_aux(self, s):
        u, v, w = s[0], s[1], s[2:]
        W = self._smat(w)
        lamw, Q = spectral.eigh_refined(W)
        lam = lamw / v
        hvals_i = jax.vmap(lambda x: self.h.h_val(x[None]))(lam)
        h1 = self.h.h_der1(lam)
        h2 = self.h.h_der2(lam)
        xi = v * jnp.sum(hvals_i)
        zeta = u - xi
        sigma = jnp.sum(hvals_i - lam * h1)
        d1h1 = spectral.fdd1(h1, h2, lam)

        n = self.w_len
        R = spectral.svec_rotation(Q, self._svec, self._smat, n)

        a = 1.0 / zeta
        b_v = -sigma / zeta
        # b_w in rotated svec coords: diagonal entries -h1/zeta
        b_w_rot = jnp.zeros(n, dtype=lam.dtype)
        b_w_rot = b_w_rot.at[self._diag_idxs()].set(-h1 / zeta)

        mvv = 1.0 / v**2 + jnp.sum(lam**2 * h2) / (v * zeta)
        mvw_rot = jnp.zeros(n, dtype=lam.dtype)
        mvw_rot = mvw_rot.at[self._diag_idxs()].set(-lam * h2 / (v * zeta))
        DW_pattern = (1.0 / jnp.outer(lamw, lamw)
                      + d1h1 / (v * zeta))
        DW = self._svec_pack_sym(DW_pattern)

        return {
            "zeta": zeta, "v": v, "lamw": lamw, "lam": lam, "Q": Q, "R": R,
            "h1": h1, "sigma": sigma, "a": a, "b_v": b_v, "b_w_rot": b_w_rot,
            "mvv": mvv, "mvw_rot": mvw_rot, "DW": DW,
        }

    def _get_aux(self, s, aux):
        if aux is None or "DW" not in aux:
            return self.point_aux(s)
        return aux

    # -- oracles -------------------------------------------------------------

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        zeta, v = aux["zeta"], aux["v"]
        g_u = -1.0 / zeta
        g_v = aux["sigma"] / zeta - 1.0 / v
        # grad_w diagonal in Q basis: h1/zeta - 1/lamw
        gw_rot = jnp.zeros(self.w_len, dtype=zeta.dtype)
        gw_rot = gw_rot.at[self._diag_idxs()].set(
            aux["h1"] / zeta - 1.0 / aux["lamw"])
        g_w = aux["R"].T @ gw_rot
        return jnp.concatenate([g_u[None], g_v[None], g_w])

    def hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        d_u, d_v, d_w = A[0, :], A[1, :], A[2:, :]
        R = aux["R"]
        d_w_rot = R @ d_w
        a, b_v, b_w_rot = aux["a"], aux["b_v"], aux["b_w_rot"]
        vdot = a * d_u + b_v * d_v + b_w_rot @ d_w_rot
        H_u = a * vdot
        H_v = b_v * vdot + aux["mvv"] * d_v + aux["mvw_rot"] @ d_w_rot
        H_w_rot = (jnp.outer(b_w_rot, vdot) + jnp.outer(aux["mvw_rot"], d_v)
                   + aux["DW"][:, None] * d_w_rot)
        H_w = R.T @ H_w_rot
        out = jnp.concatenate([H_u[None, :], H_v[None, :], H_w], axis=0)
        return out[:, 0] if one_d else out

    def hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.hess_prod(s, eye, aux)

    def inv_hess_prod(self, s, arr, aux=None):
        aux = self._get_aux(s, aux)
        one_d = arr.ndim == 1
        A = arr[:, None] if one_d else arr
        r_u, r_v, r_w = A[0, :], A[1, :], A[2:, :]
        R = aux["R"]
        r_w_rot = R @ r_w
        a, b_v, b_w_rot = aux["a"], aux["b_v"], aux["b_w_rot"]
        y = r_u / a
        rhs_v = r_v - b_v * y
        rhs_w = r_w_rot - jnp.outer(b_w_rot, y)
        # arrow solve of Mbar [xv; xw] = [rhs_v; rhs_w]
        DW, mvw, mvv = aux["DW"], aux["mvw_rot"], aux["mvv"]
        t = mvw / DW
        schur = mvv - jnp.dot(mvw, t)
        x_v = (rhs_v - t @ rhs_w) / schur
        x_w_rot = (rhs_w - jnp.outer(mvw, x_v)) / DW[:, None]
        x_u = (y - b_v * x_v - b_w_rot @ x_w_rot) / a
        x_w = R.T @ x_w_rot
        out = jnp.concatenate([x_u[None, :], x_v[None, :], x_w], axis=0)
        return out[:, 0] if one_d else out

    def inv_hess(self, s, aux=None):
        eye = jnp.eye(self.dim, dtype=s.dtype)
        return self.inv_hess_prod(s, eye, aux)

    def dder3(self, s, d, aux=None):
        """Closed-form third-order oracle -1/2 D^3 F[d,d] via the
        substitution E = DX[d] = (Dw - dv X)/v and Daleckii-Krein first and
        second divided differences of h' (semantics of `matrixcsqr.jl`
        dder3; derivation in repo notes)."""
        aux = self._get_aux(s, aux)
        u, v, w = s[0], s[1], s[2:]
        zeta, lam, Q = aux["zeta"], aux["lam"], aux["Q"]
        lamw = aux["lamw"]
        h1, sigma = aux["h1"], aux["sigma"]
        h2 = self.h.h_der2(lam)
        h3 = self.h.h_der3(lam)
        d1h1 = spectral.fdd1(h1, h2, lam)
        f2h1 = spectral.fdd2_tensor(h1, h2, h3, lam)

        du, dv = d[0], d[1]
        Dw = self._smat(d[2:])
        Dwt = Q.conj().T @ Dw @ Q                      # Dw in eigenbasis
        Et = (Dwt - dv * jnp.diag(lam).astype(Dwt.dtype)) / v  # E tilde

        # T = tr h(X) derivatives contracted with E
        D2T_EE = jnp.sum(jnp.real(d1h1 * Et * Et.conj()))
        D2T_E_mat = d1h1 * Et                          # ~ Q(.)Q' matrix
        D2T_EX = jnp.sum(lam * h2 * jnp.real(jnp.diagonal(Et)))
        M = 2 * jnp.einsum("ikj,ik,kj->ij", f2h1.astype(Et.dtype), Et, Et)
        D3T_EE_mat = M                                 # D3T[E,E,.] in basis
        D3T_EEX = jnp.sum(lam * jnp.real(jnp.diagonal(M)))

        # xi derivative pieces
        Dxi_d = sigma * dv + jnp.sum(
            jnp.real(jnp.diagonal(Dwt)) * h1)          # tr(h'(X) Dw)
        zeta_d = du - Dxi_d
        zeta_dd = -v * D2T_EE
        # grad zeta = (1, -sigma, -svec h'(X))
        hX_svec_rot = jnp.zeros(self.w_len, dtype=h1.dtype)
        hX_svec_rot = hX_svec_rot.at[self._diag_idxs()].set(h1)
        R = aux["R"]
        grad_zeta = jnp.concatenate([
            jnp.ones(1, dtype=sigma.dtype), (-sigma)[None], -(R.T @ hX_svec_rot)])
        # D2 zeta[d] = (0, -D2xi[d])
        d2xi_v = -D2T_EX
        d2xi_w = self._svec(Q @ D2T_E_mat @ Q.conj().T)
        D2zeta_d = jnp.concatenate([jnp.zeros(1, dtype=d2xi_v.dtype), (-d2xi_v)[None], -d2xi_w])
        # D3 xi[d,d] vector over (v, w)
        d3xi_v = -D2T_EE - D3T_EEX + (2 * dv / v) * D2T_EX
        d3xi_w_mat = D3T_EE_mat - (2 * dv / v) * D2T_E_mat
        d3xi_w = self._svec(Q @ d3xi_w_mat @ Q.conj().T)
        D3zeta_dd = jnp.concatenate([jnp.zeros(1, dtype=d3xi_v.dtype), (-d3xi_v)[None], -d3xi_w])

        V = (-D3zeta_dd / zeta
             + (zeta_dd * grad_zeta + 2 * zeta_d * D2zeta_d) / zeta**2
             - 2 * zeta_d**2 * grad_zeta / zeta**3)

        # phi = -log v - logdet W third derivative [d,d] gradient
        Wi_rot = 1.0 / lamw
        WiDw = (Wi_rot[:, None]) * Dwt                 # W^-1 Dw in basis
        WiDwWiDwWi = WiDw @ WiDw * Wi_rot[None, :]
        P_w = -2 * self._svec(Q @ WiDwWiDwWi @ Q.conj().T)
        P = jnp.concatenate([jnp.zeros(1, dtype=P_w.dtype), (-2 * dv**2 / v**3)[None], P_w])

        return -0.5 * (V + P)
