"""Double-single (2xf32) Pallas factorization kernel — interpret-mode
validation (the TPU lowering is exercised by benchmarks/dd_kernel_r3.py;
interpret mode runs the identical kernel logic on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hypatia_tpu.ops.pallas_dd import (dd_add, dd_chol_and_tri_inv, dd_mul,
                                       dd_sqrt)


def test_dd_arithmetic_precision():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(100)
    b = rng.standard_normal(100)
    ah = a.astype(np.float32)
    al = (a - ah.astype(np.float64)).astype(np.float32)
    bh = b.astype(np.float32)
    bl = (b - bh.astype(np.float64)).astype(np.float32)

    def back(h, l):
        return np.asarray(h, dtype=np.float64) + np.asarray(l,
                                                            dtype=np.float64)

    sh, sl = dd_add(jnp.asarray(ah), jnp.asarray(al), jnp.asarray(bh),
                    jnp.asarray(bl))
    a64 = ah.astype(np.float64) + al.astype(np.float64)
    b64 = bh.astype(np.float64) + bl.astype(np.float64)
    assert np.max(np.abs(back(sh, sl) - (a64 + b64))) < 1e-13

    ph, plo = dd_mul(jnp.asarray(ah), jnp.asarray(al), jnp.asarray(bh),
                     jnp.asarray(bl))
    assert np.max(np.abs(back(ph, plo) - a64 * b64)) < 1e-13

    pos = np.abs(a64) + 0.1
    qh = pos.astype(np.float32)
    ql = (pos - qh.astype(np.float64)).astype(np.float32)
    rh, rl = dd_sqrt(jnp.asarray(qh), jnp.asarray(ql))
    assert np.max(np.abs(back(rh, rl) - np.sqrt(pos))) < 1e-13


@pytest.mark.parametrize("n", [16, 100, 128])
def test_dd_chol_inv_interpret(n):
    rng = np.random.default_rng(n)
    M = rng.standard_normal((n, n))
    A = jnp.asarray(M @ M.T + n * np.eye(n))
    L, X = dd_chol_and_tri_inv(A, interpret=True)
    L_ref = np.linalg.cholesky(np.asarray(A))
    assert np.max(np.abs(np.asarray(L) - L_ref)) < 1e-12 * np.max(
        np.abs(L_ref))
    assert np.max(np.abs(np.asarray(X) @ L_ref - np.eye(n))) < 1e-12
    # the inverse it feeds: X^T X = A^-1
    inv = np.asarray(X).T @ np.asarray(X)
    assert np.max(np.abs(inv @ np.asarray(A) - np.eye(n))) < 1e-11


def test_dd_chol_nan_on_indefinite():
    rng = np.random.default_rng(1)
    M = rng.standard_normal((32, 32))
    B = jnp.asarray(M @ M.T - 40 * np.eye(32))
    L, _ = dd_chol_and_tri_inv(B, interpret=True)
    assert bool(jnp.any(jnp.isnan(L)))


def test_vmap_guard():
    """The dd dispatch policy must refuse vmapped operands: the Pallas
    kernel is per-matrix; vmapped lanes keep the blocked kernels (VERDICT
    r3 weak item 4c — previously enforced only by call-site discipline)."""
    import jax

    from hypatia_tpu.ops.linalg import _vmapped

    seen = {}

    def f(A):
        seen["vmap"] = _vmapped(A)
        return jnp.sum(A)

    A = jnp.ones((4, 8, 8))
    jax.vmap(f)(A)
    assert seen["vmap"] is True

    def g(A):
        seen["grad_of_vmap"] = _vmapped(A)
        return jnp.sum(A * A)

    jax.grad(lambda A: jnp.sum(jax.vmap(g)(A)))(A)
    assert seen["grad_of_vmap"] is True

    def h(A):
        seen["jit"] = _vmapped(A)
        return jnp.sum(A)

    jax.jit(h)(jnp.ones((8, 8)))
    assert seen["jit"] is False
    assert _vmapped(jnp.ones((8, 8))) is False

    def k(A):
        seen["jit_in_vmap"] = _vmapped(A)
        return jnp.sum(A)

    jax.jit(jax.vmap(k))(A)
    assert seen["jit_in_vmap"] is True
