from hypatia_tpu.ops.svec import (
    smat_to_svec,
    svec_to_smat,
    herm_to_svec,
    svec_to_herm,
    svec_length,
    svec_side,
)
from hypatia_tpu.ops.linalg import (
    cholesky_shifted,
    cho_solve,
    posdef_solve,
    qr_solve,
    sym_solve,
    solve_tri,
)
