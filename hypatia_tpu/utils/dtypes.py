"""Dtype and tolerance policy.

Tolerance defaults mirror the reference solver's eps-power scheme
(`src/Solvers/Solvers.jl:190-214`): loose tolerance ``eps**p`` and tight
tolerance ``eps**(1.5 p)`` with ``p = 0.5`` for hardware floats.
"""

import numpy as np


def eps(dtype) -> float:
    return float(np.finfo(np.dtype(dtype)).eps)


def default_tol_power(dtype) -> float:
    return 0.5


def default_tols(dtype, tol_relax: float = 1.0):
    """Return dict of default solver tolerances for a dtype.

    Matches `src/Solvers/Solvers.jl:190-214`.
    """
    e = eps(dtype)
    p = default_tol_power(dtype)
    loose = e**p * tol_relax
    tight = e ** (1.5 * p) * tol_relax
    return {
        "tol_rel_opt": loose,
        "tol_abs_opt": tight,
        "tol_feas": loose,
        "tol_infeas": tight,
        "tol_illposed": tight / 100,
    }
