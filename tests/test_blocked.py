"""Matmul-only blocked Cholesky / triangular inverse (ops/blocked.py).

These kernels replace XLA's sequential cholesky/triangular_solve on the
TPU backend (they vectorize over vmap batch axes); CPU runs keep LAPACK,
so the solver integration is exercised here by forcing the blocked path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hypatia_tpu.ops import linalg
from hypatia_tpu.ops.blocked import (
    blocked_chol_and_inv,
    blocked_cholesky,
    blocked_tri_inverse,
)


@pytest.mark.parametrize("n", [1, 3, 16, 17, 40, 64, 129])
def test_blocked_cholesky_matches_lapack(n):
    rng = np.random.default_rng(n)
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    L = np.asarray(blocked_cholesky(jnp.asarray(A)))
    Lref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, Lref, rtol=1e-12, atol=1e-12 * n)
    X = np.asarray(blocked_tri_inverse(jnp.asarray(Lref)))
    np.testing.assert_allclose(X @ Lref, np.eye(n), atol=1e-11 * n)
    L2, X2 = blocked_chol_and_inv(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(X2) @ np.asarray(L2), np.eye(n),
                               atol=1e-11 * n)


def test_blocked_batched_vmap():
    rng = np.random.default_rng(7)
    B = rng.standard_normal((6, 24, 24))
    A = B @ np.swapaxes(B, -1, -2) + 24 * np.eye(24)
    # direct batched call
    L = np.asarray(blocked_cholesky(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-10)
    # under vmap of the unbatched call (how the solver body sees it)
    Lv = np.asarray(jax.vmap(blocked_cholesky)(jnp.asarray(A)))
    np.testing.assert_allclose(Lv, np.linalg.cholesky(A), atol=1e-10)


def test_blocked_nan_on_indefinite():
    A = np.eye(5)
    A[3, 3] = -2.0
    L = blocked_cholesky(jnp.asarray(A))
    assert bool(jnp.any(jnp.isnan(L)))
    assert not bool(linalg.chol_ok(L))


def test_solver_on_blocked_path(monkeypatch):
    """Force the TPU (blocked) factorization path through a full LP +
    SOCP solve on CPU: results must match the LAPACK path."""
    monkeypatch.setattr(linalg, "_use_blocked", lambda: True)
    from hypatia_tpu import Model, Solver, cones

    rng = np.random.default_rng(3)
    A = 10 * rng.random((8, 20))
    b = A.sum(1)
    c = rng.random(20)
    model = Model(c, A, b, -np.eye(20), np.zeros(20),
                  [cones.Nonnegative(20)])
    s = Solver(fused=True)
    s.load(model)
    s.solve()
    assert s.get_status() == "Optimal"
    from scipy.optimize import linprog

    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None))
    assert abs(s.get_primal_obj() - ref.fun) < 1e-6 * (1 + abs(ref.fun))

    cc = rng.standard_normal(5)
    G = np.zeros((6, 5))
    G[1:, :] = -np.eye(5)
    h = np.zeros(6)
    h[0] = 1.0
    m2 = Model(cc, np.zeros((0, 5)), np.zeros(0), G, h,
               [cones.EpiNormEucl(6)])
    s2 = Solver(fused=True)
    s2.load(m2)
    s2.solve()
    assert s2.get_status() == "Optimal"
    assert abs(s2.get_primal_obj() + np.linalg.norm(cc)) < 1e-6

    # matrix cone (PSD lambda-min) through the blocked cone-oracle chols
    from hypatia_tpu.ops.svec import smat_to_svec
    import jax.numpy as jnp

    n = 4
    M = rng.standard_normal((n, n))
    C = (M + M.T) / 2
    dim = n * (n + 1) // 2
    cvec = np.asarray(smat_to_svec(jnp.asarray(C)))
    Ivec = np.asarray(smat_to_svec(jnp.asarray(np.eye(n))))
    m3 = Model(cvec, Ivec[None, :], np.ones(1), -np.eye(dim),
               np.zeros(dim), [cones.PosSemidefTri(dim)])
    s3 = Solver(fused=True)
    s3.load(m3)
    s3.solve()
    lam = np.linalg.eigvalsh(C).min()
    assert s3.get_status() == "Optimal"
    assert abs(s3.get_primal_obj() - lam) < 1e-6 * (1 + abs(lam))


def test_blocked_scope_tracing(monkeypatch):
    """Dispatch policy at trace time: on accelerator backends the blocked
    implementation is the default for real matrices (auto policy, round-3
    smallfact measurements); HYPATIA_TPU_NO_AUTO_BLOCKED restores the
    scope-only behavior, where blocked_scope() switches the dispatch via
    the ContextVar."""
    import jax

    monkeypatch.setattr(linalg.jax, "default_backend", lambda: "tpu",
                        raising=False)
    A = jnp.asarray(np.eye(8) * 4.0)

    def jaxpr_text():
        # fresh lambda each call: jax caches traces by function identity,
        # which would otherwise hide the ContextVar switch
        return str(jax.make_jaxpr(lambda x: linalg.cholesky(x))(A))

    # default policy: the fused pallas dd kernel for n >= 96
    A_big = jnp.asarray(np.eye(128) * 4.0)
    assert "pallas_call" in str(
        jax.make_jaxpr(lambda x: linalg.cholesky(x))(A_big))
    # below the threshold: blocked auto policy, no pallas
    assert "pallas_call" not in jaxpr_text()

    # with pallas off: the blocked auto policy (no native primitive)
    monkeypatch.setenv("HYPATIA_TPU_NO_PALLAS_DD", "1")
    assert "cholesky" not in jaxpr_text()

    monkeypatch.setenv("HYPATIA_TPU_NO_AUTO_BLOCKED", "1")
    with linalg.blocked_scope():
        txt_in = jaxpr_text()
    txt_out = jaxpr_text()
    # the native path uses the cholesky primitive; blocked is pure
    # elementwise + dynamic-update-slice and contains none
    assert "cholesky" in txt_out
    assert "cholesky" not in txt_in


def test_blocked_tri_solve():
    from hypatia_tpu.ops.blocked import blocked_tri_solve

    rng = np.random.default_rng(1)
    for n in [5, 16, 40, 64]:
        M = rng.standard_normal((n, n))
        L = np.linalg.cholesky(M @ M.T + n * np.eye(n))
        B = rng.standard_normal((n, 3))
        X = np.asarray(blocked_tri_solve(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(L @ X, B, atol=1e-12 * n)
        Xt = np.asarray(blocked_tri_solve(jnp.asarray(L), jnp.asarray(B),
                                          trans=True))
        np.testing.assert_allclose(L.T @ Xt, B, atol=1e-12 * n)
    # batched (vmap semantics via leading dims)
    Lb = np.stack([L, L + np.tril(0.1 * np.eye(n))])
    Bb = np.stack([B, 2 * B])
    Xb = np.asarray(blocked_tri_solve(jnp.asarray(Lb), jnp.asarray(Bb)))
    np.testing.assert_allclose(Lb @ Xb, Bb, atol=1e-11 * n)


def test_cholesky_shifted_and_inv_paths():
    """The fused factor+inverse agrees between the native and blocked
    dispatch paths, including the shifted-recovery scan."""
    import unittest.mock as um

    import jax.numpy as jnp

    from hypatia_tpu.ops import linalg

    rng = np.random.default_rng(0)
    M = rng.standard_normal((37, 37))
    A = jnp.asarray(M @ M.T + 37 * np.eye(37))
    L, inv, ok = linalg.cholesky_shifted_and_inv(A)
    assert bool(ok)
    assert float(jnp.max(jnp.abs(inv @ A - jnp.eye(37)))) < 1e-12
    with um.patch.object(linalg, "_use_blocked", lambda: True):
        L2, inv2, ok2 = linalg.cholesky_shifted_and_inv(A)
    assert bool(ok2)
    assert float(jnp.max(jnp.abs(L - L2))) < 1e-12
    assert float(jnp.max(jnp.abs(inv2 @ A - jnp.eye(37)))) < 1e-12
    # near-singular PSD: recovery shift must rescue the factorization
    U = np.linalg.qr(rng.standard_normal((12, 12)))[0]
    lam = np.full(12, 1.0)
    lam[-1] = -1e-18  # tiny negative eigenvalue -> raw chol fails
    P = jnp.asarray((U * lam) @ U.T)
    L3, inv3, ok3 = linalg.cholesky_shifted_and_inv(P)
    assert bool(ok3)
    # grossly indefinite: recovery must NOT claim success
    N = jnp.asarray(M @ M.T - 5 * np.eye(37))
    _, _, ok4 = linalg.cholesky_shifted_and_inv(N)
    assert not bool(ok4)
