"""Exact central-ray initial points.

The reference ships precomputed lookup tables + rational fits for the
central rays of several cones (`hypoperlog.jl:289-319`, `hypogeomean.jl:259`,
`epirelentropy.jl:381`).  Here we instead solve the central-ray condition

    s + grad F(s) = 0

exactly at cone-construction time (host-side damped Newton on the
symmetry-reduced coordinates, gradient by jax autodiff on CPU).  This is a
one-time cost per (cone type, dim) and is *more* accurate than the
reference's fits.

The iteration is domain-guarded: autodiff gradients of barriers extend
smoothly outside the cone (e.g. grad(-log zeta) = -zeta'/zeta is finite for
zeta < 0), so the system has spurious infeasible roots; steps are damped
until the barrier value is finite (i.e. the point is interior).
"""

import numpy as np


def solve_central_ray(barrier_fn, expand, reduce_dim, x0, tol=1e-12,
                      max_iter=200):
    """Solve s = -grad F(s) over a symmetry-reduced parametrization.

    barrier_fn: full-space barrier (jnp scalar function)
    expand: reduced coords (np array, reduce_dim) -> full-space point (np)
    x0: initial reduced guess (must expand to a feasible point)
    """
    import jax
    import jax.numpy as jnp

    try:
        cpu = jax.devices("cpu")[0]
        dev_ctx = lambda: jax.default_device(cpu)  # noqa: E731
    except RuntimeError:
        # accelerator-only platform (e.g. the axon TPU tunnel pins
        # JAX_PLATFORMS without a host backend): run the tiny probe evals
        # on the default device — one-time per cone dimension at build
        import contextlib

        dev_ctx = contextlib.nullcontext
    probes = _probe_indices(expand, reduce_dim)

    def barrier_val(red):
        with dev_ctx():
            return float(barrier_fn(jnp.asarray(expand(red))))

    def residual(red):
        with dev_ctx():
            s = jnp.asarray(expand(np.asarray(red, dtype=np.float64)))
            g = np.asarray(jax.grad(barrier_fn)(s))
        full = expand(np.asarray(red, dtype=np.float64)) + g
        return np.array([full[j] for j in probes])

    x = np.asarray(x0, dtype=np.float64).copy()
    assert np.isfinite(barrier_val(x)), "central ray start is infeasible"
    r = residual(x)

    for _ in range(max_iter):
        if np.max(np.abs(r)) < tol:
            break
        # finite-difference Jacobian (reduce_dim is tiny)
        J = np.zeros((reduce_dim, reduce_dim))
        for j in range(reduce_dim):
            h = 1e-7 * max(1.0, abs(x[j]))
            xp = x.copy()
            xp[j] += h
            J[:, j] = (residual(xp) - r) / h
        try:
            dx = np.linalg.solve(J, -r)
        except np.linalg.LinAlgError:
            dx = -r
        # damped step staying strictly feasible and reducing the residual
        alpha = 1.0
        for _ in range(60):
            xn = x + alpha * dx
            if np.isfinite(barrier_val(xn)):
                rn = residual(xn)
                if np.all(np.isfinite(rn)) and (
                        np.max(np.abs(rn)) < np.max(np.abs(r)) or alpha < 1e-8):
                    x, r = xn, rn
                    break
            alpha /= 2
        else:
            break

    res = np.max(np.abs(residual(x)))
    assert res < 1e-8 and np.isfinite(barrier_val(x)), (
        f"central ray solve failed (residual {res})")
    return x


def _probe_indices(expand, reduce_dim):
    """For each reduced coordinate, one full-space index it controls."""
    base = expand(np.zeros(reduce_dim))
    probes = []
    for i in range(reduce_dim):
        e = np.zeros(reduce_dim)
        e[i] = 1.0
        diff = expand(e) - base
        probes.append(int(np.argmax(np.abs(diff))))
    return probes
