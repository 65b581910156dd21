from hypatia_tpu.solvers.solver import Solver, solve, STATUSES
