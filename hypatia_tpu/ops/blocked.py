"""Matmul/VPU-only blocked Cholesky and triangular inverse.

XLA's native `cholesky` / `triangular_solve` on TPU lower to sequential
blocked kernels; under `vmap` they additionally serialize over the batch
axis, which makes the batched-instance solve body pay ~batch x the
single-instance factorization latency.  These implementations use only
elementwise VPU ops (unrolled over the small base-case diagonal) and
batched MXU matmuls, so they vectorize perfectly over any leading batch
dimensions and fuse into the surrounding program.

Functional analog of the reference's dense factorization layer
(`src/linearalgebra/dense.jl:194-215`); the algorithms are the standard
right-looking blocked Cholesky and block forward-substitution inverse.

Failure (non-PD input) propagates as NaN through the sqrt of a negative
pivot, matching `linalg.chol_ok` semantics.
"""

import jax.numpy as jnp


def _chol_unblocked(A):
    """Lower Cholesky of (..., b, b) SPD blocks, unrolled right-looking.

    b sequential steps of elementwise ops; vectorizes over leading dims.
    """
    b = A.shape[-1]
    rows = jnp.arange(b)
    L = jnp.zeros_like(A)
    for j in range(b):
        d = jnp.sqrt(A[..., j, j])
        col = A[..., :, j] / d[..., None]
        col = jnp.where(rows >= j, col, jnp.zeros_like(col))
        L = L.at[..., :, j].set(col)
        colt = jnp.where(rows > j, col, jnp.zeros_like(col))
        A = A - colt[..., :, None] * colt[..., None, :]
    return L


def _tri_solve_unblocked(L, B):
    """Solve L X = B for lower-triangular (..., b, b) blocks by unrolled
    forward substitution; B is (..., b, k)."""
    b = L.shape[-1]
    cols = jnp.arange(b)
    X = jnp.zeros_like(B)
    for i in range(b):
        Lrow = jnp.where(cols < i, L[..., i, :], jnp.zeros_like(L[..., i, :]))
        acc = jnp.einsum("...k,...kj->...j", Lrow, X)
        X = X.at[..., i, :].set(
            (B[..., i, :] - acc) / L[..., i, i][..., None])
    return X


def _tri_inv_unblocked(L):
    """Inverse of (..., b, b) lower-triangular blocks: unrolled forward
    substitution against the identity."""
    b = L.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(b, dtype=L.dtype), L.shape)
    return _tri_solve_unblocked(L, eye)


def _split(n, base):
    """Largest multiple of base strictly below n (block-aligned split)."""
    m = ((n // 2) + base - 1) // base * base
    if m >= n:
        m = n - base if n > base else 0
    return m


def _mT(M):
    return jnp.swapaxes(M, -1, -2)


def blocked_chol_and_inv(A, base=16, base_case=None):
    """(L, L^-1) of SPD (..., n, n) via recursive blocked factorization.

    L = [[L11, 0], [L21, L22]], L^-1 = [[X11, 0], [-X22 L21 X11, X22]].
    Sequential depth: n unrolled elementwise steps + O(n/base) matmuls.

    ``base_case(A_blk) -> (L_blk, Linv_blk)`` overrides the unrolled
    elementwise base kernel (e.g. the fused 2xf32 Pallas factorization
    for large panels); it is only used on unbatched 2-D blocks.
    """
    n = A.shape[-1]
    if n == 0:
        return A, A
    if n <= base:
        if base_case is not None and A.ndim == 2:
            return base_case(A)
        L = _chol_unblocked(A)
        return L, _tri_inv_unblocked(L)
    m = _split(n, base)
    L11, X11 = blocked_chol_and_inv(A[..., :m, :m], base, base_case)
    L21 = A[..., m:, :m] @ _mT(X11)
    S = A[..., m:, m:] - L21 @ _mT(L21)
    L22, X22 = blocked_chol_and_inv(S, base, base_case)
    X21 = -(X22 @ (L21 @ X11))
    z = jnp.zeros(A.shape[:-2] + (m, n - m), dtype=A.dtype)
    L = jnp.concatenate([
        jnp.concatenate([L11, z], axis=-1),
        jnp.concatenate([L21, L22], axis=-1)], axis=-2)
    X = jnp.concatenate([
        jnp.concatenate([X11, z], axis=-1),
        jnp.concatenate([X21, X22], axis=-1)], axis=-2)
    return L, X


def blocked_cholesky(A, base=16):
    """Lower Cholesky of SPD (..., n, n), matmul/VPU-only."""
    n = A.shape[-1]
    if n <= base:
        return _chol_unblocked(A)
    m = _split(n, base)
    L11, X11 = blocked_chol_and_inv(A[..., :m, :m], base)
    L21 = A[..., m:, :m] @ _mT(X11)
    S = A[..., m:, m:] - L21 @ _mT(L21)
    L22 = blocked_cholesky(S, base)
    z = jnp.zeros(A.shape[:-2] + (m, n - m), dtype=A.dtype)
    return jnp.concatenate([
        jnp.concatenate([L11, z], axis=-1),
        jnp.concatenate([L21, L22], axis=-1)], axis=-2)


def blocked_tri_inverse(L, base=16):
    """Inverse of lower-triangular (..., n, n), matmul/VPU-only."""
    n = L.shape[-1]
    if n <= base:
        return _tri_inv_unblocked(L)
    m = _split(n, base)
    X11 = blocked_tri_inverse(L[..., :m, :m], base)
    X22 = blocked_tri_inverse(L[..., m:, m:], base)
    X21 = -(X22 @ (L[..., m:, :m] @ X11))
    z = jnp.zeros(L.shape[:-2] + (m, n - m), dtype=L.dtype)
    return jnp.concatenate([
        jnp.concatenate([X11, z], axis=-1),
        jnp.concatenate([X21, X22], axis=-1)], axis=-2)


def blocked_tri_solve(L, B, base=16, trans=False):
    """Backward-stable lower-triangular solve L X = B (or L' X = B with
    trans=True), matmul/VPU-only — the substitution analog of
    blocked_tri_inverse for accuracy-critical solves inside vmapped
    contexts (explicit-inverse application has ~cond(L)*eps forward
    error; substitution is backward stable)."""
    if trans:
        # L' X = B  <=>  (flip) lower solve: P L' P is lower for the
        # anti-diagonal permutation P; equivalently solve via reversed
        # index order
        Lf = jnp.flip(jnp.swapaxes(L, -1, -2), (-1, -2))
        Bf = jnp.flip(B, -2)
        return jnp.flip(blocked_tri_solve(Lf, Bf, base), -2)
    n = L.shape[-1]
    if n <= base:
        return _tri_solve_unblocked(L, B)
    m = _split(n, base)
    X1 = blocked_tri_solve(L[..., :m, :m], B[..., :m, :], base)
    B2 = B[..., m:, :] - L[..., m:, :m] @ X1
    X2 = blocked_tri_solve(L[..., m:, m:], B2, base)
    return jnp.concatenate([X1, X2], axis=-2)
