"""Unit tests for the spectral utilities: Jacobi eigensolver and guarded
divided-difference tensors (`hypatia_tpu/ops/spectral.py`).

Parity targets: LAPACK syev accuracy (reference `dense.jl:69-75`) and the
reference's guarded Δ2/Δ3/Δ4 cascades (`epitrrelentropytri.jl:385-573`).
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hypatia_tpu.ops import spectral


def ref_log_dd(xs):
    """Exact divided difference of log at the sorted (possibly exactly
    tied) arguments, via the recurrence in long-double precision."""
    xs = sorted(np.longdouble(x) for x in xs)

    def dd(args):
        if len(args) == 1:
            return np.log(args[0])
        if abs(args[0] - args[-1]) < 1e-30:
            n = len(args) - 1
            derivs = {1: 1 / args[0], 2: -1 / args[0] ** 2 / 2,
                      3: 2 / args[0] ** 3 / 6}
            return derivs[n]
        return (dd(args[:-1]) - dd(args[1:])) / (args[0] - args[-1])

    return float(dd(xs))


@pytest.mark.parametrize("d", [1, 2, 3, 5, 8, 13])
def test_jacobi_eigh_real(d):
    rng = np.random.default_rng(d)
    A = rng.standard_normal((d, d))
    A = (A + A.T) / 2
    lam, Q = jax.jit(spectral.jacobi_eigh)(jnp.asarray(A))
    lam0 = np.linalg.eigvalsh(A)
    assert np.max(np.abs(np.asarray(lam) - lam0)) < 1e-13 * max(
        1.0, np.abs(lam0).max())
    rec = np.asarray(Q @ jnp.diag(lam) @ Q.T) - A
    assert np.abs(rec).max() < 1e-13
    orth = np.asarray(Q.T @ Q) - np.eye(d)
    assert np.abs(orth).max() < 1e-13


@pytest.mark.parametrize("d", [2, 4, 6])
def test_jacobi_eigh_complex(d):
    rng = np.random.default_rng(d)
    A = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    A = (A + A.conj().T) / 2
    lam, Q = jax.jit(spectral.jacobi_eigh)(jnp.asarray(A))
    lam0 = np.linalg.eigvalsh(A)
    assert np.max(np.abs(np.asarray(lam) - lam0)) < 1e-13 * np.abs(
        lam0).max()
    rec = np.asarray(Q @ jnp.diag(lam.astype(complex)) @ Q.conj().T) - A
    assert np.abs(rec).max() < 1e-13


def test_jacobi_eigh_relative_accuracy():
    """Small eigenvalues of ill-conditioned SPD matrices: Jacobi must be at
    least as relatively accurate as a backward-stable eigh (the property
    the quantum-RE cone needs near convergence)."""
    rng = np.random.default_rng(0)
    d = 6
    Q0, _ = np.linalg.qr(rng.standard_normal((d, d)))
    D = 10.0 ** np.arange(0, -12, -2)
    A = (Q0 * D) @ Q0.T
    A = (A + A.T) / 2
    lam, _ = jax.jit(spectral.jacobi_eigh)(jnp.asarray(A))
    lam_true = np.sort(D)
    rel = np.abs(np.asarray(lam) / lam_true - 1)
    # formation of A itself already perturbs the 1e-10 eigenvalue by ~1e-6
    assert rel.max() < 5e-6


def test_jacobi_eigh_degenerate():
    A = np.eye(4) * 2.0
    lam, Q = jax.jit(spectral.jacobi_eigh)(jnp.asarray(A))
    assert np.allclose(np.asarray(lam), 2.0)
    assert np.abs(np.asarray(Q.T @ Q) - np.eye(4)).max() < 1e-14


def test_epitrrel_dder3_explicit():
    """Explicit Δ-tensor dder3 vs jvp-of-hess at generic points, and
    finiteness + LHSCB identity at exactly-degenerate eigenvalues (where
    the jvp NaNs)."""
    from hypatia_tpu.cones.epitrrelentropy import EpiTrRelEntropyTri

    rng = np.random.default_rng(7)
    for side in (2, 3):
        n = side * (side + 1) // 2
        dim = 1 + 2 * n
        cone = EpiTrRelEntropyTri(dim)
        s0 = np.asarray(cone.init_point())
        s = jnp.asarray(s0 + 0.05 * rng.standard_normal(dim))
        assert bool(cone.feas(s))
        d = jnp.asarray(rng.standard_normal(dim))
        aux = cone.point_aux(s)
        expl = cone.dder3(s, d, aux)
        # reference: third derivative of the raw barrier by forward AD
        # (NOT through point_aux's Jacobi eigensolver, whose sign/where
        # guards are not AD-smooth)
        hvp = lambda x: jax.jvp(jax.grad(cone.barrier), (x,), (d,))[1]
        jvp = -0.5 * jax.jvp(hvp, (s,), (d,))[1]
        assert float(jnp.max(jnp.abs(expl - jvp))) < 1e-8 * float(
            jnp.max(jnp.abs(jvp)))
        # degenerate initial point: explicit oracle stays finite and exact
        si = jnp.asarray(s0)
        auxi = cone.point_aux(si)
        ddi = cone.dder3(si, d, auxi)
        assert bool(jnp.all(jnp.isfinite(ddi)))
        gi = cone.grad(si, auxi)
        assert float(jnp.max(jnp.abs(cone.dder3(si, si, auxi) + gi))) < 1e-12


@pytest.mark.parametrize("lam", [
    [0.5, 1.3, 2.7, 9.0],
    [1e-6, 1e-3, 1.0, 1e3],
    [2.0, 2.0, 5.0, 5.0],
    [1.0, 1.0, 1.0, 4.0],
    [3.0, 3.0, 3.0, 3.0],
])
def test_fdd3_tensor_log(lam):
    lam = np.array(lam)
    l = jnp.asarray(lam)
    f2 = spectral.fdd2_tensor(jnp.log(l), 1.0 / l, -l ** -2.0, l)
    f3 = np.asarray(spectral.fdd3_tensor(f2, 2.0 * l ** -3.0, l))
    for idx in itertools.product(range(4), repeat=4):
        r = ref_log_dd([lam[i] for i in idx])
        assert abs(f3[idx] - r) <= 1e-12 * max(abs(r), 1e-6), (idx, f3[idx], r)
