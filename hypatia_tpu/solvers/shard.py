"""Mesh-sharded single-model solve support.

The distributed form of the QRChol per-iteration kernel row-shards the
q-dimensional cone axis of GQ2/HGQ2 across the mesh; each device computes
its local syrk contribution to the Schur complement and XLA inserts the
all-reduce (psum over ICI) at the annotated matmul (SURVEY.md §2.9.2,
`qrchol.jl:219-246`).  Rather than hand-writing shard_map collectives
inside the step, the solver annotates data placement + sharding
constraints and lets GSPMD partition the whole fused program — the
TPU-idiomatic recipe (mesh -> annotate -> compiler collectives).

The active mesh is carried in a trace-time ContextVar so the jitted step
functions (which only see the hashable StepContext) can build
NamedSharding constraints without holding device objects.
"""

import contextlib
import contextvars

_MESH = contextvars.ContextVar("hypatia_active_mesh", default=None)


@contextlib.contextmanager
def mesh_scope(mesh):
    token = _MESH.set(mesh)
    try:
        yield
    finally:
        _MESH.reset(token)


def active_mesh():
    return _MESH.get()


def constrain(x, *axes):
    """with_sharding_constraint(x, P(*axes)) under the active mesh; no-op
    when no mesh is active (unsharded solve)."""
    mesh = _MESH.get()
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))


def mesh_key(mesh):
    """Hashable identity of a mesh for the StepContext jit cache key."""
    if mesh is None:
        return ()
    return (tuple(mesh.axis_names),
            tuple(d.id for d in mesh.devices.flat))
