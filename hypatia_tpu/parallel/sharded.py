"""Sharded single-model KKT assembly over a device mesh.

The per-iteration hot kernel of the QRChol path is the Schur complement

    S = sum_k GQ2_k' Hbar_k GQ2_k        (`qrchol.jl:219-246`)

whose natural distributed form is a row-shard of GQ2 (the q-dimensional cone
axis) per device: each device computes its local syrk contribution and the
mesh all-reduces (`psum`) the (n-p)^2 result over ICI — the main collective
of the distributed backend (SURVEY.md §2.9.2).  The Cholesky of S and the
triangular solves stay replicated (they are a small fraction of the flops).

This module provides a `shard_map`-based assembly usable inside the jitted
step, plus a demonstration driver used by `__graft_entry__.dryrun_multichip`.
Cone blocks must be padded to shard boundaries by the caller (homogeneous
Nonnegative blocks shard exactly; heterogeneous cone lists shard at cone
boundaries).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level API; experimental path deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def sharded_schur_diag(mesh, axis, GQ2, hdiag):
    """S = GQ2' diag(hdiag) GQ2 with GQ2 row-sharded over `axis`.

    For diagonal-Hessian cone blocks (Nonnegative), each device computes the
    syrk of its row shard and the result is psum-reduced over ICI.
    """

    def local(gq2_blk, hd_blk):
        contrib = gq2_blk.T @ (hd_blk[:, None] * gq2_blk)
        return jax.lax.psum(contrib, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(None, None),
    )
    return fn(GQ2, hdiag)


def sharded_schur_dense(mesh, axis, GQ2, HGQ2):
    """S = GQ2' HGQ2 with both row-sharded over `axis` (general cone path:
    HGQ2 computed per-device on its local cone blocks)."""

    def local(gq2_blk, hgq2_blk):
        return jax.lax.psum(gq2_blk.T @ hgq2_blk, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(None, None),
    )
    return fn(GQ2, HGQ2)


def demo_sharded_kkt_step(n_devices: int, n: int = 32, q: int = 64,
                          seed: int = 0):
    """One sharded KKT factor+solve: row-sharded Schur assembly (psum over
    the cone axis), replicated Cholesky + solves. Returns the solution and
    the reference (unsharded) solution for validation."""
    assert q % n_devices == 0
    rng = np.random.default_rng(seed)
    GQ2 = jnp.asarray(rng.standard_normal((q, n)))
    hdiag = jnp.asarray(rng.random(q) + 0.5)
    rhs = jnp.asarray(rng.standard_normal(n))

    mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("cones",))
    shard = NamedSharding(mesh, P("cones"))
    GQ2_s = jax.device_put(GQ2, NamedSharding(mesh, P("cones", None)))
    hdiag_s = jax.device_put(hdiag, shard)

    @jax.jit
    def solve_sharded(GQ2_s, hdiag_s, rhs):
        S = sharded_schur_diag(mesh, "cones", GQ2_s, hdiag_s)
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)

    sol = solve_sharded(GQ2_s, hdiag_s, rhs)
    S_ref = GQ2.T @ (hdiag[:, None] * GQ2)
    sol_ref = jnp.linalg.solve(S_ref, rhs) if jax.default_backend() == "cpu" \
        else None
    return np.asarray(sol), (np.asarray(sol_ref)
                             if sol_ref is not None else None)
