"""Supernodal sparse-PSD oracles vs the dense implementation.

The dense implementation (`cones/psdsparse.py`, reference `denseimpl.jl`) is
the semantic ground truth: the supernodal recursions
(`cones/psdsparse_supernodal.py`, reference `cholmodimpl.jl`) must produce
identical barrier/feas/grad/hess/dder3 values on every pattern — chordal or
not (fill-in) — for real and complex cases.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hypatia_tpu import cones
from hypatia_tpu.ops.supernodal import SupernodalStructure


@pytest.fixture(autouse=True)
def _cache_clear():
    """The XLA CPU client can crash after accumulating many compiled
    programs in one worker; the unrolled supernodal recursions are
    compile-heavy, so drop compiled state after each test."""
    yield
    jax.clear_caches()


def _random_pattern(rng, side, extra_frac=0.35):
    """Random lower-tri pattern with full diagonal."""
    rows = list(range(side))
    cols = list(range(side))
    pairs = [(i, j) for i in range(side) for j in range(i)]
    rng.shuffle(pairs)
    take = int(np.ceil(extra_frac * len(pairs)))
    for i, j in pairs[:take]:
        rows.append(i)
        cols.append(j)
    return np.array(rows), np.array(cols)


PATTERNS = [
    # banded (chordal, no fill)
    (6, np.array([0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]),
     np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5])),
    # arrow (chordal)
    (5, np.array([0, 1, 2, 3, 4, 4, 4, 4, 4]),
     np.array([0, 1, 2, 3, 0, 1, 2, 3, 4])),
    # cycle (NOT chordal -> fill-in)
    (5, np.array([0, 1, 1, 2, 2, 3, 3, 4, 4, 4]),
     np.array([0, 0, 1, 1, 2, 2, 3, 3, 0, 4])),
    # dense 3x3 (single supernode)
    (3, np.array([0, 1, 1, 2, 2, 2]), np.array([0, 0, 1, 0, 1, 2])),
]


def _interior_svec(cone, rng):
    """Diagonally-dominant pattern matrix -> strictly feasible svec point."""
    side = cone.side
    if cone.is_complex:
        M = np.zeros((side, side), dtype=complex)
    else:
        M = np.zeros((side, side))
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r == c:
            continue
        v = rng.standard_normal()
        if cone.is_complex:
            v = v + 1j * rng.standard_normal()
        M[r, c] = v
        M[c, r] = np.conj(v)
    M += np.diag(np.abs(M).sum(axis=1) + 1.0 + rng.random(side))
    # pack with this repo's svec convention (lower entry = (re - i*im)/rt2)
    out = []
    rt2 = np.sqrt(2.0)
    for r, c in zip(cone.row_idxs, cone.col_idxs):
        if r == c:
            out.append(M[r, c].real)
        else:
            out.append(M[r, c].real * rt2)
            if cone.is_complex:
                out.append(-M[r, c].imag * rt2)
    return jnp.asarray(np.array(out))


@pytest.mark.parametrize("is_complex", [False, True])
@pytest.mark.parametrize("pat", range(len(PATTERNS)))
def test_supernodal_matches_dense(pat, is_complex):
    side, rows, colz = PATTERNS[pat]
    dense = cones.PosSemidefTriSparse(side, rows, colz, is_complex=is_complex)
    supn = cones.PosSemidefTriSparseSupernodal(side, rows, colz,
                                               is_complex=is_complex)
    assert supn.dim == dense.dim
    rng = np.random.default_rng(pat + 100 * is_complex)
    for trial in range(3):
        s = _interior_svec(dense, rng)
        d = jnp.asarray(rng.standard_normal(dense.dim))

        assert bool(dense.feas(s)) and bool(supn.feas(s))
        np.testing.assert_allclose(supn.barrier(s), dense.barrier(s),
                                   rtol=1e-11)
        np.testing.assert_allclose(supn.grad(s), dense.grad(s),
                                   rtol=1e-9, atol=1e-10)
        Hd_dense = dense.hess_prod(s, d)
        Hd_sup = supn.hess_prod(s, d)
        np.testing.assert_allclose(Hd_sup, Hd_dense, rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(supn.dder3(s, d), dense.dder3(s, d),
                                   rtol=1e-8, atol=1e-9)

        aux = supn.point_aux(s)
        H = aux["hess"]
        Hd2 = H @ d
        np.testing.assert_allclose(Hd2, Hd_dense, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("is_complex", [False, True])
def test_supernodal_random_patterns(is_complex):
    rng = np.random.default_rng(7)
    for side in (7, 10, 13):
        rows, colz = _random_pattern(rng, side)
        dense = cones.PosSemidefTriSparse(side, rows, colz,
                                          is_complex=is_complex)
        supn = cones.PosSemidefTriSparseSupernodal(side, rows, colz,
                                                   is_complex=is_complex)
        s = _interior_svec(dense, rng)
        d = jnp.asarray(rng.standard_normal(dense.dim))
        np.testing.assert_allclose(supn.barrier(s), dense.barrier(s),
                                   rtol=1e-11)
        np.testing.assert_allclose(supn.grad(s), dense.grad(s),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(supn.hess_prod(s, d),
                                   dense.hess_prod(s, d),
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(supn.dder3(s, d), dense.dder3(s, d),
                                   rtol=1e-7, atol=1e-8)


def test_infeasible_detected():
    side, rows, colz = PATTERNS[0]
    supn = cones.PosSemidefTriSparseSupernodal(side, rows, colz)
    s = jnp.asarray(np.full(supn.dim, 1.0)).at[0].set(-1.0)
    assert not bool(supn.feas(s))


def test_structure_diagnostics():
    # banded pattern: supernodal fill == pattern below-diagonal nnz
    side, rows, colz = PATTERNS[0]
    S = SupernodalStructure(side, rows, colz)
    assert S.num_super >= 1
    assert S.fill_nnz() >= (len(rows) - side)
    # every supernode's below rows resolve in the parent (asserted in
    # construction); parents are topologically later
    for k in range(S.num_super):
        if S.parent[k] >= 0:
            assert S.parent[k] > k


def test_solve_matches_dense_impl():
    """Full native solve through the Solver with the supernodal cone must
    reach the same objective as the dense implementation."""
    from examples import nearestpsd
    from examples.common import run_instance

    r_dense = run_instance(nearestpsd, dict(side=6, seed=3))
    r_sup = run_instance(nearestpsd, dict(side=6, seed=3, impl="supernodal"))
    assert r_dense["status"] == "Optimal"
    assert r_sup["status"] == "Optimal"
    np.testing.assert_allclose(r_sup["primal_obj"], r_dense["primal_obj"],
                               rtol=1e-6, atol=1e-7)


def test_bucketed_equals_flat_general_pattern():
    """The level-bucketed engine (per-(level,shape)-group vmapped kernels)
    must reproduce the per-supernode recursion exactly on a general
    (non-chordal, random) pattern, real and complex."""
    PosSemidefTriSparseSupernodal = cones.PosSemidefTriSparseSupernodal

    rng = np.random.default_rng(3)
    side = 16
    rows = list(range(side))
    cols = list(range(side))
    seen = set()
    while len(seen) < 30:
        r, c = rng.integers(0, side, 2)
        if r == c:
            continue
        key = (int(max(r, c)), int(min(r, c)))
        if key in seen:
            continue
        seen.add(key)
        rows.append(key[0])
        cols.append(key[1])
    for is_complex in (False, True):
        cb = PosSemidefTriSparseSupernodal(side, rows, cols,
                                           is_complex=is_complex,
                                           bucketed=True)
        cf = PosSemidefTriSparseSupernodal(side, rows, cols,
                                           is_complex=is_complex,
                                           bucketed=False)
        assert cb.sched.num_groups() <= cb.symb.num_super
        s = jnp.asarray(cb.init_point()) + 0.05 * rng.standard_normal(cb.dim)
        d = jnp.asarray(rng.standard_normal(cb.dim))
        for f in (lambda c: c.barrier(s), lambda c: c.grad(s),
                  lambda c: c.hess_prod(s, d),
                  lambda c: c.inv_hess_prod(s, d),
                  lambda c: c.dder3(s, d)):
            vb = np.asarray(f(cb), dtype=float)
            vf = np.asarray(f(cf), dtype=float)
            assert np.max(np.abs(vb - vf)) <= 1e-10 * (
                1 + np.max(np.abs(vf)))
