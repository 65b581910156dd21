from hypatia_tpu.parallel.batch import solve_batch, solve_many
from hypatia_tpu.parallel.sharded import (
    sharded_schur_diag, sharded_schur_dense, demo_sharded_kkt_step,
)
