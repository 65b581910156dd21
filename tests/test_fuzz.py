"""Randomized mixed-cone certificate fuzz.

Builds feasible random conic problems over random cone compositions
(fixed seeds) and checks the returned certificates: primal/dual
feasibility residuals and duality gap at the reported solution. The
construction guarantees strict feasibility: s0 interior by cone
construction, h = G x0 + s0, and c chosen so the dual is feasible at a
random interior dual point (c = -G' z0 + A' y0).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hypatia_tpu import Model, Solver, cones


def _interior(cone, rng, scale=0.3):
    pt = np.asarray(cone.init_point(), dtype=float)
    return pt + scale * rng.standard_normal(cone.dim) * 0.1


def _cone_menu(rng):
    return [
        cones.Nonnegative(int(rng.integers(2, 6))),
        cones.EpiNormEucl(int(rng.integers(3, 6))),
        cones.EpiPerSquare(int(rng.integers(3, 6))),
        cones.HypoPerLog(3),
        cones.EpiNormInf(int(rng.integers(3, 6))),
        cones.PosSemidefTri(6),
        cones.HypoGeoMean(int(rng.integers(3, 5))),
        cones.EpiRelEntropy(5),
        cones.PosSemidefTriSparseSupernodal(
            4, [0, 1, 1, 2, 2, 3, 3], [0, 0, 1, 1, 2, 0, 3]),
        cones.PosSemidefTriBanded(5, 1, block=2),
    ]


@pytest.mark.parametrize("seed", range(6))
def test_random_mixed_cone_certificates(seed):
    rng = np.random.default_rng(seed)
    menu = _cone_menu(rng)
    picks = rng.choice(len(menu), size=rng.integers(2, 4), replace=False)
    cone_list = [menu[i] for i in picks]
    q = sum(c.dim for c in cone_list)
    n = int(rng.integers(3, q + 1))
    p = int(rng.integers(0, min(3, n)))

    A = rng.standard_normal((p, n))
    G = rng.standard_normal((q, n))
    x0 = rng.standard_normal(n)
    b = A @ x0

    s0 = np.concatenate([_interior(c, rng) for c in cone_list])
    h = G @ x0 + s0

    # dual-feasible c: z0 strictly interior of each dual cone (use
    # -grad at an interior primal point, which is dual-interior)
    z_parts = []
    for c in cone_list:
        pt = jnp.asarray(_interior(c, rng))
        z_parts.append(np.asarray(-c.grad(pt)))
    z0 = np.concatenate(z_parts)
    y0 = rng.standard_normal(p)
    c_vec = -G.T @ z0 + (A.T @ y0 if p else 0.0)

    model = Model(c_vec, A, b, G, h, cone_list)
    s = Solver(fused=True, default_tol_relax=10, iter_limit=150)
    s.load(model)
    s.solve()
    assert s.get_status() == "Optimal", (seed, s.get_status())

    x, y, z, sl = s.get_x(), s.get_y(), s.get_z(), s.get_s()
    scale = 1 + max(np.max(np.abs(h)), np.max(np.abs(b), initial=0.0),
                    np.max(np.abs(c_vec)))
    assert np.max(np.abs(A @ x - b)) < 1e-5 * scale if p else True
    assert np.max(np.abs(G @ x + sl - h)) < 1e-5 * scale
    dual_res = c_vec + G.T @ z + (A.T @ y if p else 0.0)
    assert np.max(np.abs(dual_res)) < 1e-5 * scale
    gap = abs(float(np.dot(c_vec, x))
              - float(-(np.dot(b, y) if p else 0.0) - np.dot(h, z)))
    assert gap < 1e-4 * scale
