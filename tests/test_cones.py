"""Cone oracle unit tests.

Parity with the reference's `test/cone.jl`:
- `test_oracles` (`cone.jl:23-114`): initial point feasibility/centrality,
  LHSCB identities <s,g> = -nu, H s = -g, H H^-1 = I, product-oracle
  consistency, sqrt-oracle consistency, dder3 identities, proximity.
- `test_barrier` (`cone.jl:117-150`): closed-form oracles checked against
  automatic differentiation of the raw barrier (ForwardDiff there, jax here).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hypatia_tpu import cones
from hypatia_tpu.cones.base import Cone


def oracle_cones():
    return [
        cones.Nonnegative(1),
        cones.Nonnegative(5),
        cones.EpiNormEucl(2),
        cones.EpiNormEucl(5),
        cones.EpiPerSquare(3),
        cones.EpiPerSquare(6),
        cones.EpiNormInf(4),
        cones.EpiNormInf(4, use_dual=True),
        cones.EpiNormInf(7, is_complex=True),
        cones.GeneralizedPower([0.25, 0.75], 2),
        cones.GeneralizedPower([0.5, 0.5], 3, use_dual=True),
        cones.HypoGeoMean(4),
        cones.HypoGeoMean(3, use_dual=True),
        cones.HypoPowerMean([0.2, 0.3, 0.5]),
        cones.HypoPowerMean([0.5, 0.5], use_dual=True),
        cones.HypoPerLog(5),
        cones.HypoPerLog(4, use_dual=True),
        cones.EpiRelEntropy(7),
        cones.EpiRelEntropy(5, use_dual=True),
        cones.PosSemidefTri(6),                      # side 3 real
        cones.PosSemidefTri(9, is_complex=True),     # side 3 complex
        cones.PosSemidefTri(3, use_dual=True),
        cones.DoublyNonnegativeTri(6),
        cones.LinMatrixIneq([np.eye(2), np.diag([1.0, -1.0])]),
        cones.HypoRootdetTri(7),
        cones.HypoRootdetTri(5, is_complex=True),
        cones.HypoPerLogdetTri(8),
        cones.EpiNormSpectral(2, 3),
        cones.EpiNormSpectral(2, 2, is_complex=True),
        cones.MatrixEpiPerSquare(2, 3),
        cones.EpiPerSepSpectralVector(cones.NegLogSSF(), 3),
        cones.EpiPerSepSpectralVector(cones.InvSSF(), 2),
        cones.EpiPerSepSpectralVector(cones.NegEntropySSF(), 3, use_dual=True),
        cones.EpiPerSepSpectralVector(cones.Power12SSF(1.5), 2),
        cones.EpiPerSepSpectralMatrix(cones.NegLogSSF(), 3),
        cones.EpiPerSepSpectralMatrix(cones.InvSSF(), 2, is_complex=True),
        cones.EpiPerSepSpectralMatrix(cones.NegEntropySSF(), 2, use_dual=True),
        cones.EpiTrRelEntropyTri(7),
        cones.EpiTrRelEntropyTri(9, is_complex=True),
        cones.WSOSInterpNonnegative(3, [np.vander(np.linspace(-1, 1, 3), 2)]),
        cones.WSOSInterpPosSemidefTri(
            2, 3, [np.vander(np.linspace(-1, 1, 3), 2)]),
        cones.WSOSInterpEpiNormEucl(
            2, 3, [np.vander(np.linspace(-1, 1, 3), 2)]),
        cones.WSOSInterpEpiNormOne(
            2, 3, [np.vander(np.linspace(-1, 1, 3), 2)]),
        cones.PosSemidefTriSparse(3, [0, 1, 1, 2, 2], [0, 0, 1, 1, 2]),
        cones.PosSemidefTriSparse(3, [0, 1, 1, 2, 2], [0, 0, 1, 1, 2],
                                  is_complex=True),
        cones.PosSemidefTriSparseSupernodal(
            3, [0, 1, 1, 2, 2], [0, 0, 1, 1, 2]),
        cones.PosSemidefTriSparseSupernodal(
            3, [0, 1, 1, 2, 2], [0, 0, 1, 1, 2], is_complex=True),
    ]


def perturbed_point(cone, rng, noise=0.1, scale=1.1):
    """Perturb + scale the initial point (`cone.jl:59-60`)."""
    pt = np.asarray(cone.init_point(), dtype=np.float64)
    pt += noise * (2 * rng.random(cone.dim) - 1)
    pt /= scale
    return jnp.asarray(pt)


@pytest.mark.parametrize("cone", oracle_cones(), ids=repr)
def test_initial_point(cone):
    s = jnp.asarray(np.asarray(cone.init_point(), dtype=np.float64))
    assert s.shape == (cone.dim,)
    assert bool(cone.feas(s))
    g = cone.grad(s)
    # dual of initial point is -g and must be dual-feasible (mu = 1 centrality)
    assert bool(cone.dual_feas(-g))


@pytest.mark.quick
@pytest.mark.parametrize("cone", oracle_cones(), ids=repr)
def test_barrier_identities(cone):
    rng = np.random.default_rng(1)
    s = perturbed_point(cone, rng)
    aux = cone.point_aux(s)
    nu = cone.nu
    tol = 1e-10 * cone.dim

    g = cone.grad(s, aux)
    # <s, g> = -nu
    assert abs(float(jnp.dot(s, g)) + nu) < 1e3 * tol

    # H s = -g
    Hs = cone.hess_prod(s, s, aux)
    np.testing.assert_allclose(np.asarray(Hs), -np.asarray(g),
                               rtol=1e-9, atol=1e-9)

    # H^-1 g = -s
    Hig = cone.inv_hess_prod(s, g, aux)
    np.testing.assert_allclose(np.asarray(Hig), -np.asarray(s),
                               rtol=1e-9, atol=1e-9)

    # H * H^-1 = I via product oracles on random matrix
    M = jnp.asarray(rng.standard_normal((cone.dim, 3)))
    HiM = cone.inv_hess_prod(s, M, aux)
    HHiM = cone.hess_prod(s, HiM, aux)
    np.testing.assert_allclose(np.asarray(HHiM), np.asarray(M),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("cone", oracle_cones(), ids=repr)
def test_oracles_vs_autodiff(cone):
    """Closed-form oracles match autodiff of the barrier (`cone.jl:139-150`)."""
    rng = np.random.default_rng(2)
    s = perturbed_point(cone, rng)
    aux = cone.point_aux(s)
    d = jnp.asarray(rng.standard_normal(cone.dim))

    g_ad = jax.grad(cone.barrier)(s)
    np.testing.assert_allclose(np.asarray(cone.grad(s, aux)),
                               np.asarray(g_ad), rtol=1e-9, atol=1e-9)

    H_ad = jax.hessian(cone.barrier)(s)
    Hd_ad = H_ad @ d
    np.testing.assert_allclose(np.asarray(cone.hess_prod(s, d, aux)),
                               np.asarray(Hd_ad), rtol=1e-8, atol=1e-8)

    if cone.has_dder3:
        # dder3 vs base-class autodiff formula
        dder3_ad = Cone.dder3(cone, s, d)
        np.testing.assert_allclose(np.asarray(cone.dder3(s, d, aux)),
                                   np.asarray(dder3_ad), rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize(
    "cone", [c for c in oracle_cones() if c.has_dder3], ids=repr)
def test_dder3_identities(cone):
    """dder3(s) = -g and <dder3(d), s> = d' H d (`cone.jl:105-111`)."""
    rng = np.random.default_rng(3)
    s = perturbed_point(cone, rng)
    aux = cone.point_aux(s)
    d = jnp.asarray(rng.standard_normal(cone.dim))

    dder3_s = cone.dder3(s, s, aux)
    g = cone.grad(s, aux)
    np.testing.assert_allclose(np.asarray(dder3_s), -np.asarray(g),
                               rtol=1e-8, atol=1e-8)

    lhs = float(jnp.dot(cone.dder3(s, d, aux), s))
    rhs = float(jnp.dot(d, cone.hess_prod(s, d, aux)))
    assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(rhs))


@pytest.mark.parametrize(
    "cone", [c for c in oracle_cones() if c.has_sqrt_oracles], ids=repr)
def test_sqrt_oracles(cone):
    """Gram convention: U'U = H and Ubar'Ubar = H^-1 — what the syrk-form
    Schur assembly consumes (`qrchol.jl:219-237`, `Cones.jl:189-206`).
    (inv_sqrt is NOT required to invert sqrt as a map; that round-trip
    only holds when the factor is symmetric.)"""
    rng = np.random.default_rng(4)
    s = perturbed_point(cone, rng)
    aux = cone.point_aux(s)
    eye = jnp.eye(cone.dim, dtype=s.dtype)
    U = cone.sqrt_hess_prod(s, eye, aux)
    H = cone.hess(s, aux)
    np.testing.assert_allclose(np.asarray(U.T @ U), np.asarray(H),
                               rtol=1e-8, atol=1e-8)
    Ubar = cone.inv_sqrt_hess_prod(s, eye, aux)
    Hi = cone.inv_hess(s, aux)
    np.testing.assert_allclose(np.asarray(Ubar.T @ Ubar), np.asarray(Hi),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("cone", oracle_cones(), ids=repr)
def test_proximity_and_numerics(cone):
    rng = np.random.default_rng(5)
    s = perturbed_point(cone, rng)
    aux = cone.point_aux(s)
    g = cone.grad(s, aux)
    # at the exact dual of s with mu=1, proximity is ~0
    z = -np.asarray(g)
    prox = float(cone.get_proxsqr(s, jnp.asarray(z), 1.0, aux))
    assert prox < 1e-8
    assert bool(cone.check_numerics(s, jnp.asarray(z), aux))
