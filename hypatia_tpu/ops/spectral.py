"""Spectral (eigendecomposition-based) derivative utilities.

Safe divided-difference machinery for matrix functions f(A) = Q f(L) Q',
used by the matrix separable-spectral and quantum relative entropy cones.
Autodiff through `eigh` divides by eigenvalue gaps and produces NaN at
degenerate eigenvalues (e.g. at the W = c*I initial points), so these cones
use explicit Daleckii-Krein formulas with first/second divided differences
guarded near coincident eigenvalues — the same approach as the reference's
`Δh/Δ2h` matrices (`matrixcsqr.jl:91-115`) and `Δ2/Δ3` tensors
(`epitrrelentropytri.jl:52-53,221-289`).
"""

import numpy as np
import jax
import jax.numpy as jnp


def eigh_refined(A):
    """eigh with one Newton orthogonality polish + Rayleigh-quotient
    eigenvalue update.

    The TPU f64 eigh is slightly less accurate than LAPACK (enough to
    stall interior-point convergence at mu ~ 1e-6 in the quantum
    relative entropy cone); the polish Q <- Q (3I - Q'Q)/2 reduces the
    orthogonality error quadratically and diag(Q'AQ) is second-order
    accurate in the eigenvector error. Three matmuls on top of eigh.
    """
    lam, Q = jnp.linalg.eigh(A)
    QtQ = Q.conj().T @ Q
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    Q = Q @ (1.5 * eye - 0.5 * QtQ)
    lam = jnp.real(jnp.diagonal(Q.conj().T @ (A @ Q)))
    return lam, Q


def fdd1(f_vals, f_der1, lam):
    """First divided difference matrix D[i,j] = (f(li)-f(lj))/(li-lj),
    D[i,i] = f'(li), with a safe switch to the midpoint derivative for
    near-coincident eigenvalues."""
    li = lam[:, None]
    lj = lam[None, :]
    diff = li - lj
    denom_ok = jnp.abs(diff) > jnp.sqrt(jnp.finfo(lam.dtype).eps) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lj)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    quotient = (f_vals[:, None] - f_vals[None, :]) / safe_diff
    mid = 0.5 * (f_der1[:, None] + f_der1[None, :])
    return jnp.where(denom_ok, quotient, mid)


def fdd2_tensor(f_vals, f_der1, f_der2, lam):
    """Second divided difference tensor F2[i,j,k] = f[li, lj, lk]
    (fully symmetric), built from the first-divided-difference matrix via
    f[a,b,c] = (f[a,b] - f[b,c])/(a - c) with safe near-coincident limits."""
    d1 = fdd1(f_vals, f_der1, lam)
    li = lam[:, None, None]
    lk = lam[None, None, :]
    diff = li - lk  # (i, 1, k)
    denom_ok = jnp.abs(diff) > jnp.sqrt(jnp.finfo(lam.dtype).eps) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lk)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    # (f[i,j] - f[j,k]) / (i - k)
    num = d1[:, :, None] - d1.T[None, :, :]
    generic = num / safe_diff
    # near li ~= lk use the limit f[a, lj, a] = d/da f[a, lj]
    # (= f''(a)/2 when lj ~= a as well)
    fallback = _fdd1_partial(f_vals, f_der1, f_der2, lam)  # (i, j)
    fallback = jnp.broadcast_to(fallback[:, :, None], generic.shape)
    return jnp.where(denom_ok, generic, fallback)


def _fdd1_partial(f_vals, f_der1, f_der2, lam):
    """g[i,j] = f[li, lj, li] = d/da f[a, lj] | a=li
    = (f'(li)(li-lj) - (f(li)-f(lj))) / (li-lj)^2, -> f''(li)/2 as lj->li."""
    li = lam[:, None]
    lj = lam[None, :]
    diff = li - lj
    denom_ok = jnp.abs(diff) > (jnp.finfo(lam.dtype).eps ** 0.25) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lj)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    generic = (f_der1[:, None] * safe_diff
               - (f_vals[:, None] - f_vals[None, :])) / safe_diff**2
    limit = jnp.broadcast_to(0.5 * f_der2[:, None], generic.shape)
    return jnp.where(denom_ok, generic, limit)


def _fdd1_deriv(f_vals, f_der1, f_der2, lam):
    return _fdd1_partial(f_vals, f_der1, f_der2, lam)


def frechet(Q, dd1, B):
    """Fréchet derivative Df(A)[B] = Q (dd1 ∘ (Q' B Q)) Q' for A = Q L Q'."""
    Bt = Q.conj().T @ B @ Q
    return Q @ (dd1 * Bt) @ Q.conj().T


def svec_rotation(Q, svec_fn, smat_fn, n):
    """Materialize the orthogonal matrix R with R @ svec(B) = svec(Q' B Q).

    R is (n, n) for svec length n; cost O(n d^3) — done once per point.
    """
    eye = jnp.eye(n, dtype=jnp.float64)

    def col(e):
        B = smat_fn(e)
        return svec_fn(Q.conj().T @ B @ Q)

    return jax.vmap(col)(eye).T  # columns are rotated basis vectors
