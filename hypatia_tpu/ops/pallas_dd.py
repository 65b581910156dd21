"""Double-single (2xf32) Pallas factorization kernels for TPU.

TPU Pallas has no f64; the solver's f64 path rides XLA's software
emulation, whose `cholesky` is a latency-bound sequential kernel (7.2 ms
at n=128 — BASELINE.md round-3 memo). This module implements the
factorization as ONE fused Pallas kernel in double-single arithmetic:
every number is an (hi, lo) pair of f32 with |lo| <= ulp(hi)/2, giving
~2^-45 relative precision via error-free transformations (Dekker/Knuth;
no hardware FMA assumed — products use Dekker splitting). That precision
is enough for the KKT factor: the direction solver measures true
residuals in f64 and iteratively refines (`syssolvers.get_directions`).

Kernel: right-looking Cholesky fused with a forward-substitution
triangular inverse, entirely in VMEM, sequential over pivots but with
full-width VPU vector steps — no per-op dispatch/sequencing overhead,
which is where the XLA formulations spend ~99% of their time.

Reference analog: LAPACK dpotrf+dtrtri via `posdef_fact_copy!` /
`inv_fact!` (`src/linearalgebra/dense.jl:15-22,191-215`).
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

# tracing the kernel through pallas' transform wrappers recurses deeper
# than CPython's default limit (observed RecursionError on the TPU
# lowering path; interpret mode stays shallow)
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for f32 (24-bit mantissa)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    # requires |a| >= |b| (or a == 0)
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = _SPLIT * a
    ah = c - (c - a)
    return ah, a - ah


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(xh, xl, yh, yl):
    sh, se = _two_sum(xh, yh)
    te = xl + yl + se
    return _fast_two_sum(sh, te)


def dd_sub(xh, xl, yh, yl):
    return dd_add(xh, xl, -yh, -yl)


def dd_mul(xh, xl, yh, yl):
    ph, pe = _two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return _fast_two_sum(ph, pe)


def dd_div(xh, xl, yh, yl):
    q1 = xh / yh
    th, tl = dd_mul(q1, jnp.zeros_like(q1), yh, yl)
    rh, rl = dd_sub(xh, xl, th, tl)
    q2 = rh / yh
    return _fast_two_sum(q1, q2)


def dd_sqrt(xh, xl):
    s = jnp.sqrt(xh)
    th, tl = dd_mul(s, jnp.zeros_like(s), s, jnp.zeros_like(s))
    rh, _ = dd_sub(xh, xl, th, tl)
    e = rh / jnp.maximum(2.0 * s, jnp.finfo(jnp.float32).tiny)
    return _fast_two_sum(s, e)


def _tree_sum_axis0(h, l):
    """Error-compensated reduction over axis 0 by halving (log2 levels);
    axis-0 size must be a power of two."""
    n = h.shape[0]
    while n > 1:
        m = n // 2
        h, l = dd_add(h[:m], l[:m], h[m:], l[m:])
        n = m
    return h[0], l[0]


def _dd_chol_inv_kernel(ah_ref, al_ref, lh_ref, ll_ref, xh_ref, xl_ref):
    n = ah_ref.shape[0]
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    Ah, Al = ah_ref[:], al_ref[:]
    Lh = jnp.zeros((n, n), dtype=f32)
    Ll = jnp.zeros((n, n), dtype=f32)

    def chol_step(j, carry):
        Ah, Al, Lh, Ll = carry
        # pivot d = A[j, j]
        pick = (rows == j) & (cols == j)
        dh = jnp.sum(jnp.where(pick, Ah, 0.0))
        dl = jnp.sum(jnp.where(pick, Al, 0.0))
        sh, sl = dd_sqrt(dh, dl)
        # column j of A (rows >= j)
        colmask = cols == j
        cjh = jnp.sum(jnp.where(colmask, Ah, 0.0), axis=1)
        cjl = jnp.sum(jnp.where(colmask, Al, 0.0), axis=1)
        # L[:, j] = col / sqrt(d), masked to rows >= j
        lh_col, ll_col = dd_div(cjh, cjl,
                                jnp.full((n,), sh, f32),
                                jnp.full((n,), sl, f32))
        rmask = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) >= j
        lh_col = jnp.where(rmask, lh_col, 0.0)
        ll_col = jnp.where(rmask, ll_col, 0.0)
        Lh = jnp.where(colmask, lh_col[:, None], Lh)
        Ll = jnp.where(colmask, ll_col[:, None], Ll)
        # rank-1 trailing update: A -= l l^T on rows,cols > j
        below = lh_col * (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) > j)
        belowl = ll_col * (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) > j)
        oh, ol = dd_mul(below[:, None], belowl[:, None],
                        below[None, :], belowl[None, :])
        Ah, Al = dd_sub(Ah, Al, oh, ol)
        return Ah, Al, Lh, Ll

    # i32 loop bounds: under jax_enable_x64 Python-int bounds make the
    # index i64, which Mosaic's convert lowering cannot handle (infinite
    # _convert_helper recursion)
    Ah, Al, Lh, Ll = jax.lax.fori_loop(
        np.int32(0), np.int32(n), chol_step, (Ah, Al, Lh, Ll))
    lh_ref[:] = Lh
    ll_ref[:] = Ll

    # forward substitution: X = L^-1, row i at a time, vectorized over
    # all n right-hand-side columns
    Xh = jnp.zeros((n, n), dtype=f32)
    Xl = jnp.zeros((n, n), dtype=f32)
    eye = (rows == cols).astype(f32)

    def inv_step(i, carry):
        Xh, Xl = carry
        # L[i, :] with k < i
        rmask = rows == i
        lih = jnp.sum(jnp.where(rmask, Lh, 0.0), axis=0)
        lil = jnp.sum(jnp.where(rmask, Ll, 0.0), axis=0)
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < i
        lih = jnp.where(kmask, lih, 0.0)
        lil = jnp.where(kmask, lil, 0.0)
        # acc = sum_k L[i,k] X[k, :]
        ph, plo = dd_mul(lih[:, None], lil[:, None], Xh, Xl)
        ah, al = _tree_sum_axis0(ph, plo)
        # e_i - acc
        ei = jnp.sum(jnp.where(rmask, eye, 0.0), axis=0)
        rh, rl = dd_sub(ei, jnp.zeros_like(ei), ah, al)
        # / L[i, i]
        pick = (rows == i) & (cols == i)
        dh = jnp.sum(jnp.where(pick, Lh, 0.0))
        dl = jnp.sum(jnp.where(pick, Ll, 0.0))
        xih, xil = dd_div(rh, rl, jnp.full((n,), dh, f32),
                          jnp.full((n,), dl, f32))
        Xh = jnp.where(rmask, xih[None, :], Xh)
        Xl = jnp.where(rmask, xil[None, :], Xl)
        return Xh, Xl

    Xh, Xl = jax.lax.fori_loop(np.int32(0), np.int32(n), inv_step,
                               (Xh, Xl))
    xh_ref[:] = Xh
    xl_ref[:] = Xl


def _to_dd(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _from_dd(h, l):
    return h.astype(jnp.float64) + l.astype(jnp.float64)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _dd_core(A, interpret):
    from jax.experimental import pallas as pl

    n = A.shape[-1]
    # next power of two >= 128: lane-width aligned AND a valid shape for
    # the halving tree reduction in the kernel
    npad = 128
    while npad < n:
        npad *= 2
    if npad != n:
        pad = jnp.eye(npad, dtype=A.dtype)
        A = pad.at[:n, :n].set(A)
    ah, al = _to_dd(A)
    out_shape = [jax.ShapeDtypeStruct((npad, npad), jnp.float32)
                 for _ in range(4)]
    # trace the kernel with x64 canonicalization OFF: under
    # jax_enable_x64 scalar loop indices/constants canonicalize to 64-bit,
    # and Mosaic's convert-element-type lowering recurses forever on
    # 64-bit ints. Everything inside the kernel is explicitly 32-bit.
    with jax.enable_x64(False):
        lh, ll, xh, xl = pl.pallas_call(
            _dd_chol_inv_kernel,
            out_shape=out_shape,
            interpret=interpret,
        )(ah, al)
    L = _from_dd(lh, ll)
    X = _from_dd(xh, xl)
    if npad != n:
        L = L[:n, :n]
        X = X[:n, :n]
    return L, X


@_dd_core.defjvp
def _dd_core_jvp(interpret, primals, tangents):
    """Exact factorization differential (pallas kernels have no AD rules;
    cone oracles differentiate barriers that factor through here):

        dL = L Phi(X dA X^T),  Phi = tril with halved diagonal
        dX = -X dL X
    """
    (A,), (dA,) = primals, tangents
    L, X = _dd_core(A, interpret)
    F = X @ dA @ X.swapaxes(-1, -2)
    Phi = jnp.tril(F) - 0.5 * jnp.diag(jnp.diagonal(F))
    dL = L @ Phi
    dX = -(X @ dL @ X)
    return (L, X), (dL, dX)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dd_chol_and_tri_inv(A, interpret=False):
    """(L, L^-1) of SPD A (f64 in/out) via the fused 2xf32 Pallas kernel.

    A's side is padded to a multiple of 128 (VPU lane width) with an
    identity extension (chol of blkdiag(A, I) = blkdiag(L, I)). Non-PSD
    input propagates NaN through the pivot sqrt, matching
    `linalg.chol_ok` semantics. Differentiable via an exact custom JVP.
    """
    return _dd_core(A, interpret)
