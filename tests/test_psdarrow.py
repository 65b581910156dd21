"""Arrow (bordered block-diagonal) PSD cone vs the dense implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hypatia_tpu import cones
from hypatia_tpu.cones.psdarrow import arrow_pattern


@pytest.fixture(autouse=True)
def _cache_clear():
    yield
    jax.clear_caches()


def _interior(cone, rng):
    side = cone.side
    M = np.zeros((side, side))
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r != c:
            M[r, c] = M[c, r] = rng.standard_normal() * 0.5
    M += np.diag(np.abs(M).sum(axis=1) + 1.0 + rng.random(side))
    rt2 = np.sqrt(2.0)
    return jnp.asarray(np.array(
        [M[r, c] * (1.0 if r == c else rt2)
         for r, c in zip(cone.row_idxs, cone.col_idxs)]))


@pytest.mark.parametrize("K,b,m", [(3, 2, 2), (4, 1, 3), (2, 3, 1),
                                   (1, 2, 2)])
def test_arrow_matches_dense(K, b, m):
    rows, cols = arrow_pattern(K, b, m)
    side = K * b + m
    dense = cones.PosSemidefTriSparse(side, rows, cols)
    arw = cones.PosSemidefTriArrow(K, b, m)
    assert arw.dim == dense.dim
    rng = np.random.default_rng(K * 100 + b * 10 + m)
    for _ in range(2):
        s = _interior(dense, rng)
        d = jnp.asarray(rng.standard_normal(dense.dim))
        assert bool(dense.feas(s)) and bool(arw.feas(s))
        np.testing.assert_allclose(arw.barrier(s), dense.barrier(s),
                                   rtol=1e-11)
        np.testing.assert_allclose(arw.grad(s), dense.grad(s),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(arw.hess_prod(s, d), dense.hess_prod(s, d),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(arw.dder3(s, d), dense.dder3(s, d),
                                   rtol=1e-7, atol=1e-8)
        aux = arw.point_aux(s)
        np.testing.assert_allclose(aux["hess"] @ d, dense.hess_prod(s, d),
                                   rtol=1e-8, atol=1e-9)


def test_arrow_program_size_constant():
    sizes = []
    for K in (3, 9):
        arw = cones.PosSemidefTriArrow(K, 2, 2)
        s = jnp.asarray(np.ones(arw.dim))
        jaxpr = jax.make_jaxpr(arw.barrier)(s)
        sizes.append(len(jaxpr.jaxpr.eqns))
    assert sizes[0] == sizes[1]


def test_arrow_solve():
    from hypatia_tpu import Model, solve

    K, b, m = 3, 2, 2
    rows, cols = arrow_pattern(K, b, m)
    side = K * b + m
    rng = np.random.default_rng(7)
    dense = cones.PosSemidefTriSparse(side, rows, cols)
    arw = cones.PosSemidefTriArrow(K, b, m)
    avals = rng.standard_normal(dense.dim)
    diag = (rows == cols).astype(float)
    objs = []
    for cone in (dense, arw):
        mm = Model(-avals, diag[None, :], np.array([1.0]),
                   -np.eye(cone.dim), np.zeros(cone.dim), [cone])
        s = solve(mm)
        assert s.get_status() == "Optimal"
        objs.append(s.get_primal_obj())
    np.testing.assert_allclose(objs[1], objs[0], rtol=1e-6, atol=1e-7)


def test_structured_factory():
    from hypatia_tpu.cones import structured_psd_sparse
    from hypatia_tpu.cones.psdbanded import band_pattern

    r, c = band_pattern(12, 2)
    assert type(structured_psd_sparse(12, r, c)).__name__ == \
        "PosSemidefTriBanded"
    r, c = arrow_pattern(4, 2, 3)
    assert type(structured_psd_sparse(11, r, c)).__name__ == \
        "PosSemidefTriArrow"
    # permuted entry order must NOT substitute a layout-changing class
    perm = np.random.default_rng(0).permutation(len(r))
    k = structured_psd_sparse(11, r[perm], c[perm])
    assert type(k).__name__ == "PosSemidefTriSparseSupernodal"
    # irregular pattern -> supernodal; tiny -> dense
    rows = np.array(list(range(10)) + [5, 7, 9])
    cols = np.array(list(range(10)) + [0, 2, 3])
    assert type(structured_psd_sparse(10, rows, cols)).__name__ == \
        "PosSemidefTriSparseSupernodal"
    assert type(structured_psd_sparse(
        4, [0, 1, 1, 2, 2, 3], [0, 0, 1, 1, 2, 3])).__name__ == \
        "PosSemidefTriSparse"


def _interior_c(cone, rng):
    side = cone.side
    M = np.zeros((side, side), dtype=complex)
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r != c:
            v = (rng.standard_normal() + 1j * rng.standard_normal()) * 0.4
            M[r, c] = v
            M[c, r] = np.conj(v)
    M += np.diag(np.abs(M).sum(axis=1).real + 1.0 + rng.random(side))
    out = []
    rt2 = np.sqrt(2.0)
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r == c:
            out.append(M[r, c].real)
        else:
            out.append(M[r, c].real * rt2)
            out.append(-M[r, c].imag * rt2)
    return jnp.asarray(np.array(out))


@pytest.mark.parametrize("K,b,m", [(3, 2, 2), (2, 1, 3)])
def test_arrow_complex_matches_dense(K, b, m):
    rows, cols = arrow_pattern(K, b, m)
    side = K * b + m
    dense = cones.PosSemidefTriSparse(side, rows, cols, is_complex=True)
    arw = cones.PosSemidefTriArrow(K, b, m, is_complex=True)
    assert arw.dim == dense.dim
    rng = np.random.default_rng(K + b + m)
    s = _interior_c(dense, rng)
    d = jnp.asarray(rng.standard_normal(dense.dim))
    assert bool(dense.feas(s)) and bool(arw.feas(s))
    np.testing.assert_allclose(arw.barrier(s), dense.barrier(s), rtol=1e-11)
    np.testing.assert_allclose(arw.grad(s), dense.grad(s),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(arw.hess_prod(s, d), dense.hess_prod(s, d),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(arw.dder3(s, d), dense.dder3(s, d),
                               rtol=1e-7, atol=1e-8)
