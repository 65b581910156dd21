"""Native instances for the matrix cone zoo (parity with the per-cone
instances in `test/nativeinstances.jl`)."""

import numpy as np
import pytest

from hypatia_tpu import cones
from hypatia_tpu.ops.svec import smat_to_svec, herm_to_svec
import jax.numpy as jnp

from tests.test_native import build_solve_check


def _svec_np(W):
    return np.asarray(smat_to_svec(jnp.asarray(W)))


def _hsvec_np(W):
    return np.asarray(herm_to_svec(jnp.asarray(W)))


def test_possemideftri():
    """max u s.t. [[1, u], [u, 1]] PSD -> u* = 1."""
    E = np.array([[0.0, 1.0], [1.0, 0.0]])
    G = -_svec_np(E)[:, None]
    h = _svec_np(np.eye(2))
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.PosSemidefTri(3)], expect_obj=-1.0)


def test_possemideftri_complex():
    """max re s.t. [[1, re + i*im0], [re - i*im0, 1]] hermitian PSD with
    im fixed: re^2 + im0^2 <= 1."""
    im0 = 0.6
    E_re = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    H0 = np.array([[1.0, 1j * im0], [-1j * im0, 1.0]])
    G = -_hsvec_np(E_re)[:, None]
    h = _hsvec_np(H0)
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.PosSemidefTri(4, is_complex=True)],
                      expect_obj=-0.8)


def test_doublynonnegative():
    """min u s.t. [[1,u],[u,1]] PSD and entrywise nonneg -> u* = 0."""
    E = np.array([[0.0, 1.0], [1.0, 0.0]])
    G = -_svec_np(E)[:, None]
    h = _svec_np(np.eye(2))
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.DoublyNonnegativeTri(3)], expect_obj=0.0,
                      tol=1e-6)


def test_linmatrixineq():
    """max w2 s.t. I + w2*diag(1,-1) > 0 -> w2* = 1.

    The pencil is singular at the optimum, so the iterates land within a
    small factor of the eps^0.5 default tolerance (gap ~7e-9 vs 1.5e-8)
    and the exact side flips with eps-level rounding; run at the
    reference example-test relaxation (`runexamplestests.jl`
    default_tol_relax=10) like the example suites."""
    A = np.zeros((1, 2))
    A[0, 0] = 1.0
    b = [1.0]
    G = -np.eye(2)
    h = np.zeros(2)
    build_solve_check([0.0, -1.0], A, b, G, h,
                      [cones.LinMatrixIneq([np.eye(2),
                                            np.diag([1.0, -1.0])])],
                      expect_obj=-1.0, tol=1e-6, default_tol_relax=10)


def test_hyporootdettri():
    """max u s.t. W = diag(1, 4) -> u* = 2."""
    W0 = np.diag([1.0, 4.0])
    G = np.zeros((4, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], _svec_np(W0)])
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoRootdetTri(4)], expect_obj=-2.0)


def test_hypoperlogdettri():
    """max u s.t. v=1, W = e*I(2) -> u* = 2."""
    W0 = np.e * np.eye(2)
    G = np.zeros((5, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], _svec_np(W0)])
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoPerLogdetTri(5)], expect_obj=-2.0)


def test_epinormspectral():
    """min u s.t. W = fixed -> u* = sigma_max(W)."""
    rng = np.random.default_rng(3)
    W0 = rng.standard_normal((2, 3))
    smax = np.linalg.svd(W0, compute_uv=False).max()
    G = np.zeros((7, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], W0.T.reshape(-1)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiNormSpectral(2, 3)], expect_obj=smax)


def test_epinormspectral_dual():
    """min u s.t. W = fixed over nuclear-norm cone -> u* = sum sigma."""
    rng = np.random.default_rng(4)
    W0 = rng.standard_normal((2, 3))
    nuc = np.linalg.svd(W0, compute_uv=False).sum()
    G = np.zeros((7, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], W0.T.reshape(-1)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiNormSpectral(2, 3, use_dual=True)],
                      expect_obj=nuc)


def test_matrixepipersquare():
    """min tr(U) s.t. v = 1, W fixed -> U* = W W'/2, obj = ||W||_F^2/2."""
    rng = np.random.default_rng(5)
    W0 = rng.standard_normal((2, 3))
    un = 3  # svec length side 2
    # vars: svec(U); s = (svec(U), 1, vec(W0))
    c = _svec_np(np.eye(2))  # tr(U) = <svec(I), svec(U)>
    G = np.zeros((3 + 1 + 6, 3))
    G[:3, :] = -np.eye(3)
    h = np.concatenate([np.zeros(3), [1.0], W0.T.reshape(-1)])
    build_solve_check(c, np.zeros((0, 3)), np.zeros(0), G, h,
                      [cones.MatrixEpiPerSquare(2, 3)],
                      expect_obj=float(np.sum(W0**2)) / 2)


def test_epitrrelentropy():
    """min u s.t. V = V0, W = W0 -> u* = tr(W0 log W0 - W0 log V0)."""
    import scipy.linalg
    rng = np.random.default_rng(6)
    M1 = rng.standard_normal((2, 2))
    V0 = M1 @ M1.T + 0.5 * np.eye(2)
    M2 = rng.standard_normal((2, 2))
    W0 = M2 @ M2.T + 0.5 * np.eye(2)
    opt = float(np.trace(W0 @ (scipy.linalg.logm(W0) - scipy.linalg.logm(V0))))
    G = np.zeros((7, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], _svec_np(V0), _svec_np(W0)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiTrRelEntropyTri(7)], expect_obj=opt,
                      tol=1e-6)


def test_epipersepspectral_matrix_neglog():
    """min u s.t. v=1, W=W0 with h=-log -> u* = -logdet(W0)."""
    rng = np.random.default_rng(7)
    M = rng.standard_normal((2, 2))
    W0 = M @ M.T + 0.5 * np.eye(2)
    opt = -float(np.linalg.slogdet(W0)[1])
    G = np.zeros((5, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], _svec_np(W0)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiPerSepSpectralMatrix(cones.NegLogSSF(), 2)],
                      expect_obj=opt, tol=1e-6)


def test_epipersepspectral_matrix_entropy():
    """min u s.t. v=1, W=W0 with h=x log x -> u* = tr(W0 log W0)."""
    import scipy.linalg
    rng = np.random.default_rng(8)
    M = rng.standard_normal((2, 2))
    W0 = M @ M.T + 0.5 * np.eye(2)
    opt = float(np.trace(W0 @ scipy.linalg.logm(W0)))
    G = np.zeros((5, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0, 1.0], _svec_np(W0)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiPerSepSpectralMatrix(cones.NegEntropySSF(),
                                                     2)],
                      expect_obj=opt, tol=1e-6)


def test_epinormspectral_complex():
    """min u s.t. W = fixed complex -> u* = sigma_max(W)."""
    rng = np.random.default_rng(6)
    W0 = rng.standard_normal((2, 3)) + 1j * rng.standard_normal((2, 3))
    smax = np.linalg.svd(W0, compute_uv=False).max()
    cone = cones.EpiNormSpectral(2, 3, is_complex=True)
    wvec = np.asarray(cone._wvec(jnp.asarray(W0)))
    dim = 1 + wvec.size
    G = np.zeros((dim, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], wvec])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiNormSpectral(2, 3, is_complex=True)],
                      expect_obj=smax)


def test_hyporootdettri_complex():
    """max u s.t. W = fixed Hermitian -> u* = det(W)^(1/d)."""
    rng = np.random.default_rng(7)
    M = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
    W0 = M @ M.conj().T + 3 * np.eye(3)
    opt = float(np.real(np.linalg.det(W0))) ** (1.0 / 3.0)
    wvec = _hsvec_np(W0)
    dim = 1 + wvec.size
    G = np.zeros((dim, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], wvec])
    build_solve_check([-1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.HypoRootdetTri(dim, is_complex=True)],
                      expect_obj=-opt)


def test_epitrrelentropy_large_side_eigh_refined():
    """d=17 exercises the eigh_refined (side>16) oracle path end-to-end
    (`cones/epitrrelentropy.py` point_aux branch): min u with V, W fixed
    -> u* = tr(W log W - W log V)."""
    import scipy.linalg
    d = 17
    rng = np.random.default_rng(3)

    def randpsd():
        M = rng.standard_normal((d, d))
        return M @ M.T / d + 0.5 * np.eye(d)

    V0, W0 = randpsd(), randpsd()
    opt = float(np.trace(W0 @ (scipy.linalg.logm(W0)
                               - scipy.linalg.logm(V0))))
    w_len = d * (d + 1) // 2
    dim = 1 + 2 * w_len
    G = np.zeros((dim, 1))
    G[0, 0] = -1.0
    h = np.concatenate([[0.0], _svec_np(V0), _svec_np(W0)])
    build_solve_check([1.0], np.zeros((0, 1)), np.zeros(0), G, h,
                      [cones.EpiTrRelEntropyTri(dim)], expect_obj=opt,
                      default_tol_relax=10, check_tol=1e-5)


def test_relentrentanglement_tight_tolerance():
    """The flagship quantum-RE config at default_tol_relax=1 (no
    relaxation): VERDICT round-2 weak item — previously Optimal only at
    relax=10 on TPU; the f64 CPU path must hold the tight tolerances."""
    import examples

    from hypatia_tpu import Solver

    model = examples.relentrentanglement.build(na=2, nb=2)
    solver = Solver(verbose=False, iter_limit=100, default_tol_relax=1)
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"
    obj = solver.get_primal_obj()
    assert abs(obj - solver.get_dual_obj()) <= 1e-7 * (1 + abs(obj))
