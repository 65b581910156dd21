"""Input-normalization analogs of the reference MOI transformations
(`src/MathOptInterface/wrapper.jl:300-413`): merged Nonnegative rows and
interval-to-EpiNormInf scaling, with dual/slack untransforms."""

import numpy as np
import pytest

from hypatia_tpu import Model, cones, solve
from hypatia_tpu.interface import normalize


def _lp(seed=3, m=4, n=9):
    rng = np.random.default_rng(seed)
    A = rng.random((m, n))
    x0 = rng.random(n)
    b = A @ x0
    c = rng.random(n)
    return c, A, b


def test_merge_adjacent_nonnegative():
    c, A, b = _lp()
    n = c.size
    G = -np.eye(n)
    h = np.zeros(n)
    ks = [cones.Nonnegative(3), cones.Nonnegative(4), cones.Nonnegative(2)]
    m1 = Model(c, A, b, G, h, ks)
    m2, perm = normalize.merge_nonnegative(m1)
    assert len(m2.cones) == 1 and m2.cones[0].dim == n
    assert np.array_equal(perm, np.arange(n))
    s1 = solve(m1, verbose=False)
    s2 = solve(m2, verbose=False)
    assert s1.get_status() == s2.get_status() == "Optimal"
    assert np.isclose(s1.get_primal_obj(), s2.get_primal_obj(), rtol=1e-6)


def test_merge_with_permutation():
    c, A, b = _lp(seed=5, n=8)
    n = c.size
    # Nonnegative(3), EpiNormEucl(3), Nonnegative(2): non-adjacent NN runs
    G = -np.eye(n)
    h = np.concatenate([np.zeros(3), [2.0], np.zeros(n - 4)])
    ks = [cones.Nonnegative(3), cones.EpiNormEucl(3), cones.Nonnegative(2)]
    m1 = Model(c, A, b, G, h, ks)
    m2, perm = normalize.merge_nonnegative(m1, permute=True)
    types = [type(k).__name__ for k in m2.cones]
    assert types == ["Nonnegative", "EpiNormEucl"]
    assert m2.cones[0].dim == 5
    # permuted rows still encode the same constraints
    assert np.allclose(m2.G, m1.G[perm, :])
    assert np.allclose(m2.h, m1.h[perm])
    s1 = solve(m1, verbose=False)
    s2 = solve(m2, verbose=False)
    assert s1.get_status() == s2.get_status() == "Optimal"
    assert np.isclose(s1.get_primal_obj(), s2.get_primal_obj(), rtol=1e-6)


def test_interval_to_epinorminf_matches_two_sided_lp():
    rng = np.random.default_rng(11)
    n, k = 6, 3
    c = rng.standard_normal(n)
    Grows = rng.standard_normal((k, n))
    grows = rng.standard_normal(k)
    lower = -1.0 + 0.1 * rng.random(k)
    upper = 1.0 + 0.1 * rng.random(k)
    # box on x to keep it bounded
    Gbox = np.vstack([-np.eye(n), np.eye(n)])
    hbox = np.ones(2 * n)

    # formulation 1: intervals as two Nonnegative blocks
    G1 = np.vstack([Gbox, Grows, -Grows])
    h1 = np.concatenate([hbox, upper - grows, grows - lower])
    m1 = Model(c, np.zeros((0, n)), np.zeros(0), G1, h1,
               [cones.Nonnegative(2 * n + 2 * k)])

    # formulation 2: reference-style scaled EpiNormInf block
    Gi, hi, ki, scales, mids = normalize.intervals_to_epinorminf(
        Grows, grows, lower, upper)
    assert np.allclose(scales, 2.0 / (upper - lower))
    G2 = np.vstack([Gbox, Gi])
    h2 = np.concatenate([hbox, hi])
    m2 = Model(c, np.zeros((0, n)), np.zeros(0), G2, h2,
               [cones.Nonnegative(2 * n), ki])

    s1 = solve(m1, verbose=False)
    s2 = solve(m2, verbose=False)
    assert s1.get_status() == s2.get_status() == "Optimal"
    assert np.isclose(s1.get_primal_obj(), s2.get_primal_obj(),
                      rtol=1e-5, atol=1e-6)

    # slack untransform: recover mid - g - a'x at the original scale
    x = s2.get_x()
    s_blk = np.asarray(s2.get_s())[2 * n:]
    rec = normalize.interval_slack_untransform(s_blk, scales)
    assert np.allclose(rec, mids - grows - Grows @ x, atol=1e-5)

    # dual untransform shape + direction (z .*= scales)
    z_blk = np.asarray(s2.get_z())[2 * n:]
    zd = normalize.interval_dual_untransform(z_blk, scales)
    assert zd.shape == (k,)
    assert np.allclose(zd, z_blk[1:] * scales)


def test_interval_validation():
    with pytest.raises(AssertionError):
        normalize.intervals_to_epinorminf(
            np.ones((1, 2)), [0.0], [1.0], [1.0])  # upper == lower
    with pytest.raises(AssertionError):
        normalize.intervals_to_epinorminf(
            np.ones((1, 2)), [0.0], [-np.inf], [1.0])  # infinite bound
