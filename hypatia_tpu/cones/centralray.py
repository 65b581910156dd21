"""Exact central-ray initial points.

The reference ships precomputed lookup tables + rational fits for the
central rays of several cones (`hypoperlog.jl:289-319`, `hypogeomean.jl:259`,
`epirelentropy.jl:381`).  Here we instead solve the central-ray condition

    s + grad F(s) = 0

exactly at cone-construction time (host-side, tiny Newton system on the
symmetry-reduced coordinates, gradient by jax autodiff on CPU).  This is a
one-time cost per (cone type, dim) and is *more* accurate than the
reference's fits.
"""

import functools

import numpy as np


def solve_central_ray(barrier_fn, expand, reduce_dim, x0):
    """Solve s = -grad F(s) over a symmetry-reduced parametrization.

    barrier_fn: full-space barrier (jnp scalar function)
    expand: reduced coords (np array, reduce_dim) -> full-space point (np)
    x0: initial reduced guess (must expand to a feasible point)
    """
    import jax
    import jax.numpy as jnp
    import scipy.optimize

    cpu = jax.devices("cpu")[0]

    def residual(red):
        with jax.default_device(cpu):
            s = jnp.asarray(expand(np.asarray(red, dtype=np.float64)))
            g = np.asarray(jax.grad(barrier_fn)(s))
        full = expand(np.asarray(red, dtype=np.float64)) + g
        # pick one representative residual per reduced coordinate
        return collapse(expand, reduce_dim, full)

    sol = scipy.optimize.fsolve(residual, np.asarray(x0, dtype=np.float64),
                                xtol=1e-12, full_output=False)
    res = np.max(np.abs(residual(sol)))
    assert res < 1e-9, f"central ray solve failed (residual {res})"
    return sol


def collapse(expand, reduce_dim, full_vec):
    """Map a full-space vector to reduced coords by sampling the entries that
    each reduced coordinate controls (valid for indicator-style expand maps)."""
    # find, for each reduced coordinate, one full index it controls
    probes = []
    base = expand(np.zeros(reduce_dim))
    for i in range(reduce_dim):
        e = np.zeros(reduce_dim)
        e[i] = 1.0
        diff = expand(e) - base
        idx = int(np.argmax(np.abs(diff)))
        probes.append(idx)
    return np.array([full_vec[j] for j in probes])
