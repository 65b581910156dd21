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
