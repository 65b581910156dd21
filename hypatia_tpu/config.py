"""Global configuration for hypatia_tpu.

The solver defaults to float64 everywhere (interior-point tolerances of
``eps**0.5 ~ 1.5e-8`` are unreachable in float32).  On TPU, XLA supports f64
for cholesky/eigh/qr/matmul (LU is f32-only), so the whole compute path is
built on Cholesky/QR factorizations.

Mirrors the reference's generic-real-type design (Hypatia `src/Hypatia.jl`,
`Solver{T}` in `src/Solvers/Solvers.jl:62`): dtype is a parameter of the model
and solver, with tolerance defaults derived from machine epsilon.
"""

import os

import jax

if not os.environ.get("HYPATIA_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    import jax.numpy as jnp

    if os.environ.get("HYPATIA_TPU_NO_X64"):
        return jnp.float32
    return jnp.float64
