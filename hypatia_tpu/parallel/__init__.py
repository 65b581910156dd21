from hypatia_tpu.parallel.batch import solve_batch
