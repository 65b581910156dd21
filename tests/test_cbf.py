"""CBF reader tests (CBLIB parity)."""

import os

import numpy as np
import pytest

CBLIB_VENDORED = ("/root/reference/examples/CBLIB/cblib_data/"
                  "expdesign_D_8_4.cbf.gz")


def test_read_cbf_inline(tmp_path):
    """Tiny hand-written CBF: min x1+x2 s.t. x1+x2 >= 1, x >= 0."""
    text = """VER
3

OBJSENSE
MIN

VAR
2 1
L+ 2

CON
1 1
L+ 1

OBJACOORD
2
0 1.0
1 1.0

ACOORD
2
0 0 1.0
0 1 1.0

BCOORD
1
0 -1.0
"""
    path = tmp_path / "tiny.cbf"
    path.write_text(text)
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    model = read_cbf(str(path))
    solver = Solver()
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"
    assert abs(solver.get_primal_obj() - 1.0) < 1e-7


@pytest.mark.skipif(not os.path.exists(CBLIB_VENDORED),
                    reason="vendored CBLIB instance not available")
def test_read_cblib_expdesign():
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    model = read_cbf(CBLIB_VENDORED)
    assert model.n == 61
    solver = Solver(default_tol_relax=10, iter_limit=150)
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"


def test_read_cbf_pow(tmp_path):
    """POW cone: max x3 s.t. x1=2, x2=1.5, x in POW(0.4, 0.6)
    -> x3* = 2^0.4 * 1.5^0.6."""
    text = """VER
3

POWCONES
1 2
2
0.4
0.6

OBJSENSE
MIN

VAR
3 1
@0:POW 3

CON
2 1
L= 2

OBJACOORD
1
2 -1.0

ACOORD
2
0 0 1.0
1 1 1.0

BCOORD
2
0 -2.0
1 -1.5
"""
    path = tmp_path / "pow.cbf"
    path.write_text(text)
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    model = read_cbf(str(path))
    solver = Solver()
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"
    assert abs(-solver.get_primal_obj() - 2**0.4 * 1.5**0.6) < 1e-6
