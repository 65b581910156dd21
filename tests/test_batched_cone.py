"""BatchedCone: vmapped grouping of structurally-identical cones."""

import numpy as np
import jax.numpy as jnp
import pytest

from hypatia_tpu import Model, Solver, cones
from hypatia_tpu.cones.batched import BatchedCone, group_cones


def _rand_interior(base, g, rng):
    pt0 = np.tile(np.asarray(base.init_point()), g)
    return jnp.asarray(pt0 + 0.05 * rng.standard_normal(base.dim * g))


@pytest.mark.parametrize("base,g", [
    (cones.HypoPerLog(3), 4),
    (cones.EpiNormEucl(4), 3),
    (cones.PosSemidefTri(6), 2),
])
def test_batched_oracles_match_loop(base, g):
    rng = np.random.default_rng(0)
    bc = BatchedCone(base, g)
    s = _rand_interior(base, g, rng)
    d = base.dim
    parts = [s[i * d:(i + 1) * d] for i in range(g)]

    assert bc.dim == g * d
    assert bc.nu == g * base.nu
    np.testing.assert_array_equal(bc.nu_parts(), np.tile(base.nu_parts(), g))

    assert bool(bc.feas(s)) == all(bool(base.feas(p)) for p in parts)
    gref = np.concatenate([np.asarray(base.grad(p)) for p in parts])
    np.testing.assert_allclose(np.asarray(bc.grad(s)), gref, rtol=1e-12)

    v = jnp.asarray(rng.standard_normal(bc.dim))
    href = np.concatenate([
        np.asarray(base.hess_prod(p, v[i * d:(i + 1) * d]))
        for i, p in enumerate(parts)])
    np.testing.assert_allclose(np.asarray(bc.hess_prod(s, v)), href,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(bc.inv_hess_prod(s, bc.hess_prod(s, v))), np.asarray(v),
        rtol=1e-8, atol=1e-8)

    d3ref = np.concatenate([
        np.asarray(base.dder3(p, v[i * d:(i + 1) * d]))
        for i, p in enumerate(parts)])
    np.testing.assert_allclose(np.asarray(bc.dder3(s, v)), d3ref,
                               rtol=1e-9, atol=1e-9)

    z = jnp.asarray(np.abs(rng.standard_normal(bc.dim)) + 1.0)
    # sz parts = per-sub-cone dots
    np.testing.assert_allclose(
        np.asarray(bc.sz_parts(s, z)),
        [float(jnp.dot(p, z[i * d:(i + 1) * d]))
         for i, p in enumerate(parts)], rtol=1e-12)


def test_group_cones_adjacent_runs():
    cl = [cones.Nonnegative(4), cones.HypoPerLog(3), cones.HypoPerLog(3),
          cones.HypoPerLog(3), cones.EpiNormEucl(5)]
    idxs = []
    start = 0
    for c in cl:
        idxs.append((start, c.dim))
        start += c.dim
    gc, gi = group_cones(tuple(cl), tuple(idxs))
    assert len(gc) == 3
    assert isinstance(gc[1], BatchedCone) and gc[1].count == 3
    assert gi[1] == (4, 9)
    assert gi[2] == (13, 5)
    # dual-form cones must not merge with primal-form ones
    cl2 = [cones.HypoPerLog(3), cones.HypoPerLog(3, use_dual=True)]
    gc2, _ = group_cones(tuple(cl2), ((0, 3), (3, 3)))
    assert len(gc2) == 2


def test_grouped_solve_matches_ungrouped():
    # entropy-style model with several identical exp cones
    rng = np.random.default_rng(2)
    k = 5
    q = 3 * k
    n = k
    # min sum u_i st (u_i, 1, w_i) in HypoPerLog, w = given
    G = np.zeros((q, n))
    h = np.zeros(q)
    w = 0.5 + rng.random(k)
    for i in range(k):
        G[3 * i, i] = -1.0
        h[3 * i + 1] = 1.0
        h[3 * i + 2] = w[i]
    c = -np.ones(n)  # maximize sum u = sum log(w_i)
    cl = [cones.HypoPerLog(3) for _ in range(k)]
    opt = -float(np.sum(np.log(w)))

    m1 = Model(c, np.zeros((0, n)), np.zeros(0), G, h, cl)
    s1 = Solver(fused=True)
    s1.load(m1)
    s1.solve()
    assert isinstance(s1.ctx.cones[0], BatchedCone)
    assert s1.get_status() == "Optimal"
    assert abs(s1.get_primal_obj() - opt) < 1e-7 * (1 + abs(opt))

    m2 = Model(c, np.zeros((0, n)), np.zeros(0), G, h,
               [cones.HypoPerLog(3) for _ in range(k)])
    s2 = Solver(fused=True, group_cones=False)
    s2.load(m2)
    s2.solve()
    assert s2.get_status() == "Optimal"
    assert abs(s1.get_primal_obj() - s2.get_primal_obj()) < 1e-9 * (
        1 + abs(opt))
    assert s1.get_num_iters() == s2.get_num_iters()


def test_sort_perm_groups_nonadjacent():
    """Permutation layer: interleaved same-structure cones are sorted
    adjacent, grouped, and the solution is un-permuted back exactly."""
    from hypatia_tpu.cones.batched import sort_perm_for_grouping

    rng = np.random.default_rng(0)
    cl = [cones.Nonnegative(3), cones.HypoPerLog(3), cones.Nonnegative(3),
          cones.HypoPerLog(3), cones.Nonnegative(3)]
    q = sum(c.dim for c in cl)
    n = 6
    G = rng.standard_normal((q, n))
    h = np.concatenate([np.asarray(c.init_point()) for c in cl]) * 3 \
        + rng.standard_normal(q) * 0.05
    # dual strictly feasible by construction (c = -G'z0, z0 interior) so
    # the instance is bounded
    import jax.numpy as _jnp
    z0 = np.concatenate([-np.asarray(c.grad(_jnp.asarray(
        np.asarray(c.init_point())))) for c in cl])
    c_obj = -G.T @ z0
    A = rng.standard_normal((2, n))
    b = np.zeros(2)
    idxs = []
    start = 0
    for c in cl:
        idxs.append((start, c.dim))
        start += c.dim
    assert sort_perm_for_grouping(cl, idxs) is not None

    m = Model(c_obj, A, b, G, h, cl)
    results = {}
    for name, opts in [("sorted-fused", dict(group_cones=True, fused=True)),
                       ("sorted-host", dict(group_cones=True, fused=False)),
                       ("plain", dict(group_cones=False))]:
        s = Solver(**opts)
        s.load(m)
        s.solve()
        assert s.get_status() == "Optimal"
        results[name] = s

    s_sorted = results["sorted-fused"]
    # 5 interleaved cones -> 2 batched groups
    assert len(s_sorted.ctx.cones) == 2
    ref = results["plain"]
    for name in ("sorted-fused", "sorted-host"):
        s = results[name]
        assert abs(s.get_primal_obj() - ref.get_primal_obj()) \
            <= 1e-6 * (1 + abs(ref.get_primal_obj()))
        for k in "xyzs":
            v1 = getattr(s, "get_" + k)()
            v2 = getattr(ref, "get_" + k)()
            assert np.allclose(v1, v2, atol=1e-5), (name, k)


def test_sort_perm_with_mesh():
    """Sorting permutation layer composes with the mesh-sharded solve."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    rng = np.random.default_rng(0)
    cl = [cones.Nonnegative(3), cones.HypoPerLog(3)] * 4  # q = 24
    q = sum(c.dim for c in cl)
    n = 6
    G = rng.standard_normal((q, n))
    h = np.concatenate([np.asarray(c.init_point()) for c in cl]) * 3 \
        + rng.standard_normal(q) * 0.05
    z0 = np.concatenate([-np.asarray(c.grad(jnp.asarray(
        np.asarray(c.init_point())))) for c in cl])
    c_obj = -G.T @ z0
    A = rng.standard_normal((2, n))
    m = Model(c_obj, A, np.zeros(2), G, h, cl)

    mesh = Mesh(np.array(jax.devices()), ("q",))
    s1 = Solver(mesh=mesh)
    s1.load(m)
    s1.solve()
    s2 = Solver(group_cones=False)
    s2.load(m)
    s2.solve()
    assert s1.get_status() == s2.get_status() == "Optimal"
    assert len(s1.ctx.cones) == 2
    for k in "xyzs":
        assert np.allclose(getattr(s1, "get_" + k)(),
                           getattr(s2, "get_" + k)(), atol=1e-5), k
