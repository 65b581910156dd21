"""Batched-instance solving over a virtual device mesh."""

import numpy as np
import jax
from jax.sharding import Mesh

from hypatia_tpu import Model, cones
from hypatia_tpu.parallel import solve_batch


def _random_lp(seed, m=6, n=12):
    rng = np.random.default_rng(seed)
    A = 10 * rng.random((m, n))
    b = A.sum(axis=1)
    c = rng.random(n)
    return Model(c, A, b, -np.eye(n), np.zeros(n), [cones.Nonnegative(n)])


def test_solve_batch_lps():
    models = [_random_lp(seed) for seed in range(4)]
    results = solve_batch(models)
    import scipy.optimize
    for model, res in zip(models, results):
        assert res["status"] == "Optimal", res
        ref = scipy.optimize.linprog(model.c, A_eq=model.A, b_eq=model.b,
                                     bounds=(0, None)).fun
        assert abs(res["primal_obj"] - ref) < 1e-6 * (1 + abs(ref))


def test_solve_batch_sharded_mesh():
    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    models = [_random_lp(seed) for seed in range(n_dev)]
    mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
    results = solve_batch(models, mesh=mesh)
    for res in results:
        assert res["status"] == "Optimal", res


def test_solve_batch_socp():
    def make(seed):
        rng = np.random.default_rng(seed)
        n = 5
        F = rng.standard_normal((n, n)) / 3
        mu = rng.random(n)
        c = np.concatenate([[1.0], -mu])
        A = np.hstack([np.zeros((1, 1)), np.ones((1, n))])
        b = [1.0]
        G = np.zeros((1 + n + n, 1 + n))
        G[0, 0] = -1.0
        G[1:1 + n, 1:] = -F
        G[1 + n:, 1:] = -np.eye(n)
        h = np.zeros(1 + 2 * n)
        return Model(c, A, b, G, h,
                     [cones.EpiNormEucl(1 + n), cones.Nonnegative(n)])

    models = [make(seed) for seed in range(3)]
    results = solve_batch(models)
    for res in results:
        assert res["status"] == "Optimal", res


def test_sharded_schur_assembly():
    """Row-sharded Schur assembly + psum matches the replicated result."""
    from hypatia_tpu.parallel import demo_sharded_kkt_step

    n_dev = len(jax.devices())
    sol, ref = demo_sharded_kkt_step(n_dev, n=16, q=16 * n_dev)
    assert ref is not None
    np.testing.assert_allclose(sol, ref, rtol=1e-9, atol=1e-9)


def test_sharded_single_model_solve():
    """Full fused solve of ONE model with the Schur assembly row-sharded
    over the mesh (Solver(mesh=...)): identical status/iterates/objective
    to the unsharded path."""
    from hypatia_tpu import Solver

    model = _random_lp(3, m=16, n=48)
    ref = Solver(verbose=False, fused=True, default_tol_relax=10)
    ref.load(model)
    ref.solve()
    assert ref.get_status() == "Optimal"

    mesh = Mesh(np.array(jax.devices()), axis_names=("cones",))
    sh = Solver(verbose=False, fused=True, default_tol_relax=10, mesh=mesh)
    sh.load(_random_lp(3, m=16, n=48))
    sh.solve()
    assert sh.get_status() == "Optimal"
    # iterate trajectories can differ by a step or two: the sharded Schur
    # psum sums partial products in a different order, and the IPM's
    # discrete alpha choices amplify the last-bit differences
    assert abs(sh.get_num_iters() - ref.get_num_iters()) <= 3
    np.testing.assert_allclose(sh.get_primal_obj(), ref.get_primal_obj(),
                               rtol=1e-7, atol=1e-9)
    # zero (nonbasic) entries land anywhere below the solve tolerance
    np.testing.assert_allclose(sh.get_x(), ref.get_x(), rtol=1e-5,
                               atol=1e-5)


def test_sharded_single_model_socp():
    """Sharded solve with heterogeneous cones (Nonnegative + EpiNormEucl
    blocks spanning shard boundaries)."""
    from hypatia_tpu import Solver

    rng = np.random.default_rng(11)
    n = 9
    # portfolio-style SOCP: max c'x s.t. sum x = 1, x >= 0, ||F x|| <= g'x
    sigma = rng.random((n, n)) * 0.1
    sigma = sigma @ sigma.T + np.eye(n)
    F = np.linalg.cholesky(sigma).T
    c = -rng.random(n)
    A = np.ones((1, n))
    b = np.array([1.0])
    gamma = 1.2
    G = np.vstack([-np.eye(n),
                   np.concatenate([[-gamma]], axis=0) * np.ones((1, n)) * 0,
                   -F])
    G[n, :] = 0.0
    h = np.zeros(n + 1 + n)
    h[n] = gamma
    model = Model(c, A, b, G, h,
                  [cones.Nonnegative(n), cones.EpiNormEucl(1 + n)])

    ref = Solver(verbose=False, fused=True, default_tol_relax=10)
    ref.load(model)
    ref.solve()

    mesh = Mesh(np.array(jax.devices()), axis_names=("cones",))
    sh = Solver(verbose=False, fused=True, default_tol_relax=10, mesh=mesh)
    sh.load(model.copy() if hasattr(model, "copy") else model)
    sh.solve()
    assert sh.get_status() == ref.get_status()
    assert abs(sh.get_num_iters() - ref.get_num_iters()) <= 3
    np.testing.assert_allclose(sh.get_primal_obj(), ref.get_primal_obj(),
                               rtol=1e-7, atol=1e-9)


def test_solve_batch_blocked_kernels(monkeypatch):
    """Force the blocked (TPU vmap-vectorizing) factorizations through the
    batched body on CPU — the code path the real TPU batch takes."""
    from hypatia_tpu.ops import linalg

    monkeypatch.setattr(linalg, "_use_blocked", lambda: True)
    models = [_random_lp(100 + seed) for seed in range(3)]
    results = solve_batch(models)
    import scipy.optimize
    for model, res in zip(models, results):
        assert res["status"] == "Optimal", res
        ref = scipy.optimize.linprog(model.c, A_eq=model.A, b_eq=model.b,
                                     bounds=(0, None)).fun
        assert abs(res["primal_obj"] - ref) < 1e-6 * (1 + abs(ref))


def test_sharded_single_model_matrix_cone():
    """Sharded Schur assembly with a matrix cone in the mix (logdet-style
    model): per-cone hess products row-shard over the mesh; iterates match
    the unsharded solve."""
    from hypatia_tpu import Solver
    from hypatia_tpu.ops.svec import smat_to_svec
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    side = 4
    dim = side * (side + 1) // 2
    M = rng.standard_normal((side, side))
    C = (M + M.T) / 2
    cvec = np.asarray(smat_to_svec(jnp.asarray(C)))
    Ivec = np.asarray(smat_to_svec(jnp.asarray(np.eye(side))))
    # min tr(CX) s.t. tr(X) = 1, X psd, plus a nonnegative slack block to
    # make q a multiple of the device count (sharding pads otherwise)
    n = dim
    model = Model(cvec, Ivec[None, :], np.ones(1), -np.eye(n), np.zeros(n),
                  [cones.PosSemidefTri(dim)])

    ref = Solver(verbose=False, fused=True, default_tol_relax=10)
    ref.load(model)
    ref.solve()

    mesh = Mesh(np.array(jax.devices()), axis_names=("cones",))
    m2 = Model(cvec, Ivec[None, :], np.ones(1), -np.eye(n), np.zeros(n),
               [cones.PosSemidefTri(dim)])
    sh = Solver(verbose=False, fused=True, default_tol_relax=10, mesh=mesh)
    sh.load(m2)
    sh.solve()
    lam = np.linalg.eigvalsh(C).min()
    assert ref.get_status() == "Optimal"
    assert sh.get_status() == "Optimal"
    np.testing.assert_allclose(sh.get_primal_obj(), lam,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sh.get_primal_obj(), ref.get_primal_obj(),
                               rtol=1e-8, atol=1e-10)


def test_solve_many_heterogeneous():
    """solve_many buckets mixed-structure models and preserves order."""
    from hypatia_tpu.parallel import solve_many

    models = [_random_lp(0), _random_lp(1, m=4, n=9), _random_lp(2),
              _random_lp(3, m=4, n=9)]
    results = solve_many(models)
    import scipy.optimize
    for model, res in zip(models, results):
        assert res["status"] == "Optimal", res
        ref = scipy.optimize.linprog(model.c, A_eq=model.A, b_eq=model.b,
                                     bounds=(0, None)).fun
        assert abs(res["primal_obj"] - ref) < 1e-6 * (1 + abs(ref))
