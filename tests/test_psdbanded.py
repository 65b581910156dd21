"""Scan-form banded PSD cone vs the dense and generic supernodal impls."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hypatia_tpu import cones
from hypatia_tpu.cones.psdbanded import band_pattern


@pytest.fixture(autouse=True)
def _cache_clear():
    yield
    jax.clear_caches()


def _interior(cone, rng):
    side = cone.side
    M = np.zeros((side, side))
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r != c:
            M[r, c] = M[c, r] = rng.standard_normal()
    M += np.diag(np.abs(M).sum(axis=1) + 1.0 + rng.random(side))
    out = []
    rt2 = np.sqrt(2.0)
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        out.append(M[r, c] * (1.0 if r == c else rt2))
    return jnp.asarray(np.array(out))


@pytest.mark.parametrize("side,band,block", [
    (7, 1, None), (7, 2, 3), (12, 3, 4), (9, 2, None),
    (8, 2, 4),   # side a multiple of block
    (5, 4, 4),   # nearly dense band
])
def test_banded_matches_dense(side, band, block):
    rows, cols = band_pattern(side, band)
    dense = cones.PosSemidefTriSparse(side, rows, cols)
    bnd = cones.PosSemidefTriBanded(side, band, block=block)
    assert bnd.dim == dense.dim
    rng = np.random.default_rng(side * 10 + band)
    for _ in range(2):
        s = _interior(dense, rng)
        d = jnp.asarray(rng.standard_normal(dense.dim))
        assert bool(dense.feas(s)) and bool(bnd.feas(s))
        np.testing.assert_allclose(bnd.barrier(s), dense.barrier(s),
                                   rtol=1e-11)
        np.testing.assert_allclose(bnd.grad(s), dense.grad(s),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(bnd.hess_prod(s, d), dense.hess_prod(s, d),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(bnd.dder3(s, d), dense.dder3(s, d),
                                   rtol=1e-7, atol=1e-8)
        aux = bnd.point_aux(s)
        np.testing.assert_allclose(aux["hess"] @ d, dense.hess_prod(s, d),
                                   rtol=1e-8, atol=1e-9)


def test_banded_infeasible():
    bnd = cones.PosSemidefTriBanded(6, 2)
    at = np.zeros(bnd.dim)
    # identity matrix with the first diagonal entry negated
    for i, (r, c) in enumerate(zip(bnd.row_idxs, bnd.col_idxs)):
        if r == c:
            at[i] = 1.0
    s = jnp.asarray(at).at[0].set(-1.0)
    assert not bool(bnd.feas(s))


def test_banded_program_size_constant():
    """The scan form traces O(1) equations in side (the point of it)."""
    sizes = []
    for side in (12, 24):
        bnd = cones.PosSemidefTriBanded(side, 2, block=4)
        s = jnp.asarray(np.tile(1.0, bnd.dim))
        jaxpr = jax.make_jaxpr(bnd.barrier)(s)
        sizes.append(len(jaxpr.jaxpr.eqns))
    assert sizes[0] == sizes[1]


def test_banded_solve():
    """nearest-banded-PSD solve matches the dense-impl objective."""
    from hypatia_tpu import Model, solve

    side, band = 8, 2
    rows, cols = band_pattern(side, band)
    rng = np.random.default_rng(5)
    dense = cones.PosSemidefTriSparse(side, rows, cols)
    bnd = cones.PosSemidefTriBanded(side, band, block=3)
    avals = rng.standard_normal(dense.dim)
    diag = (rows == cols).astype(float)
    objs = []
    for cone in (dense, bnd):
        m = Model(-avals, diag[None, :], np.array([1.0]),
                  -np.eye(cone.dim), np.zeros(cone.dim), [cone])
        s = solve(m)
        assert s.get_status() == "Optimal"
        objs.append(s.get_primal_obj())
    np.testing.assert_allclose(objs[1], objs[0], rtol=1e-6, atol=1e-7)


def test_cg_inverse_matches_exact():
    """Light-aux (matrix-free CG) inverse oracle matches the factored one."""
    rng = np.random.default_rng(1)
    side, band = 9, 2
    bnd = cones.PosSemidefTriBanded(side, band, block=3)
    rows, cols = band_pattern(side, band)
    M = np.zeros((side, side))
    for r, c in zip(rows, cols):
        if r != c:
            M[r, c] = M[c, r] = rng.standard_normal() * 0.4
    M += np.diag(np.abs(M).sum(1) + 1.5)
    rt2 = np.sqrt(2.0)
    s = jnp.asarray(np.array([M[r, c] * (1 if r == c else rt2)
                              for r, c in zip(rows, cols)]))
    v = jnp.asarray(rng.standard_normal(bnd.dim))
    aux_full = bnd.point_aux(s)
    aux_light = bnd.point_aux_light(s)
    assert "hess" not in aux_light
    x_exact = bnd.inv_hess_prod(s, v, aux_full)
    x_cg = bnd.inv_hess_prod(s, v, aux_light)
    np.testing.assert_allclose(x_cg, x_exact, rtol=1e-8, atol=1e-10)
    g = bnd.grad(s, aux_light)
    assert float(bnd.get_proxsqr(s, -g, 1.0, aux_light)) < 1e-10
    assert bool(bnd.check_numerics(s, -g, aux_light))


def test_banded_solve_batch():
    """Batched (vmapped) solves work over the scan-form cone oracles."""
    from hypatia_tpu import Model
    from hypatia_tpu.parallel import solve_batch

    side, band = 6, 2
    rows, cols = band_pattern(side, band)
    diag = (rows == cols).astype(float)
    models = []
    for seed in range(3):
        rng = np.random.default_rng(seed)
        cone = cones.PosSemidefTriBanded(side, band, block=3)
        avals = rng.standard_normal(cone.dim)
        models.append(Model(-avals, diag[None, :], np.array([1.0]),
                            -np.eye(cone.dim), np.zeros(cone.dim), [cone]))
    results = solve_batch(models)
    from hypatia_tpu import solve
    for m, res in zip(models, results):
        assert res["status"] == "Optimal", res
        ref = solve(m)
        assert abs(res["primal_obj"] - ref.get_primal_obj()) \
            <= 1e-6 * (1 + abs(ref.get_primal_obj()))


def test_banded_grouped_pair():
    """Two identical banded cones in one model group into a vmapped
    BatchedCone (scans under vmap)."""
    from hypatia_tpu import Model, Solver

    side, band = 5, 1
    rows, cols = band_pattern(side, band)
    diag = (rows == cols).astype(float)
    rng = np.random.default_rng(2)
    c1 = cones.PosSemidefTriBanded(side, band, block=2)
    c2 = cones.PosSemidefTriBanded(side, band, block=2)
    d = c1.dim
    avals = rng.standard_normal(2 * d)
    A = np.zeros((2, 2 * d))
    A[0, :d] = diag
    A[1, d:] = diag
    m = Model(-avals, A, np.array([1.0, 1.0]),
              -np.eye(2 * d), np.zeros(2 * d), [c1, c2])
    s1 = Solver(group_cones=True)
    s1.load(m)
    s1.solve()
    s2 = Solver(group_cones=False)
    s2.load(m)
    s2.solve()
    assert s1.get_status() == "Optimal"
    assert len(s1.ctx.cones) == 1  # grouped
    assert abs(s1.get_primal_obj() - s2.get_primal_obj()) \
        <= 1e-6 * (1 + abs(s2.get_primal_obj()))


def test_banded_other_syssolvers():
    """The structured cone works through the H-form KKT paths too (the
    explicit-Hessian consumers: symindef, naiveelim H-form)."""
    from hypatia_tpu import Model, Solver

    side, band = 6, 2
    rows, cols = band_pattern(side, band)
    rng = np.random.default_rng(3)
    avals = rng.standard_normal(len(rows))
    diag = (rows == cols).astype(float)
    objs = []
    for kw in (dict(syssolver="qrchol"),
               dict(syssolver="symindef", reduce=False),
               dict(syssolver="naiveelim", reduce=False,
                    naiveelim_inv_hess=False)):
        cone = cones.PosSemidefTriBanded(side, band, block=3)
        m = Model(-avals, diag[None, :], np.array([1.0]),
                  -np.eye(cone.dim), np.zeros(cone.dim), [cone])
        s = Solver(**kw)
        s.load(m)
        s.solve()
        assert s.get_status() == "Optimal", (kw, s.get_status())
        objs.append(s.get_primal_obj())
    assert max(objs) - min(objs) <= 1e-6 * (1 + abs(objs[0]))


def _interior_c(cone, rng):
    side = cone.side
    M = np.zeros((side, side), dtype=complex)
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r != c:
            v = rng.standard_normal() + 1j * rng.standard_normal()
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


@pytest.mark.parametrize("side,band,block", [(7, 2, 3), (9, 1, None)])
def test_banded_complex_matches_dense(side, band, block):
    rows, cols = band_pattern(side, band)
    dense = cones.PosSemidefTriSparse(side, rows, cols, is_complex=True)
    bnd = cones.PosSemidefTriBanded(side, band, block=block,
                                    is_complex=True)
    assert bnd.dim == dense.dim
    rng = np.random.default_rng(side + band)
    s = _interior_c(dense, rng)
    d = jnp.asarray(rng.standard_normal(dense.dim))
    assert bool(dense.feas(s)) and bool(bnd.feas(s))
    np.testing.assert_allclose(bnd.barrier(s), dense.barrier(s), rtol=1e-11)
    np.testing.assert_allclose(bnd.grad(s), dense.grad(s),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(bnd.hess_prod(s, d), dense.hess_prod(s, d),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(bnd.dder3(s, d), dense.dder3(s, d),
                               rtol=1e-7, atol=1e-8)
