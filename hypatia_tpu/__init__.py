"""hypatia_tpu: a TPU-native generic conic interior-point solver.

A from-scratch JAX/XLA implementation of a predictor-corrector interior-point
method on the homogeneous self-dual embedding, for conic problems

    min c'x   s.t.  b - A x = 0,   h - G x in K

over Cartesian products of exotic cones with known primal or dual
logarithmically-homogeneous self-concordant barriers.  Capability target:
chriscoey/Hypatia.jl (see SURVEY.md); architecture target: TPU hardware
(MXU matmuls + batched Cholesky/eigh for the per-iteration KKT solves, fully
on-device jitted steps, mesh sharding for cone blocks and batched instances).
"""

import hypatia_tpu.config  # noqa: F401  (must be first: enables x64)

from hypatia_tpu.models import Model
from hypatia_tpu.solvers import Solver, solve
from hypatia_tpu import cones

__version__ = "0.1.0"
