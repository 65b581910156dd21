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


def test_read_cbf_var_exp_domain(tmp_path):
    """Variables declared directly in an EXP domain must get the same
    (x3,x2,x1) -> HypoPerLog coordinate permutation as EXP constraints.

    max x3 s.t. x1 = 2, x2 = 1, (x1,x2,x3) in EXP
    (x1 >= x2 exp(x3/x2)) -> x3* = x2 log(x1/x2) = log 2."""
    text = """VER
3

OBJSENSE
MIN

VAR
3 1
EXP 3

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
1 -1.0
"""
    path = tmp_path / "varexp.cbf"
    path.write_text(text)
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    model = read_cbf(str(path))
    solver = Solver()
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"
    # max x3 with x1=2, x2=1: x3* = x2 log(x1/x2) = log 2
    assert abs(-solver.get_primal_obj() - np.log(2.0)) < 1e-6


def test_read_cbf_psdvar_fcoord(tmp_path):
    """PSDVAR + FCOORD: min tr(CX) s.t. <A,X> = 1, X psd (2x2).

    C = I, A = E12+E21: optimum X = [[.5,.5],[.5,.5]], obj 1... actually
    min tr(X) s.t. X12+X21 = 1, X psd -> X11=X22=1/2, obj 1."""
    text = """VER
3

OBJSENSE
MIN

PSDVAR
1
2

CON
1 1
L= 1

OBJFCOORD
2
0 0 0 1.0
0 1 1 1.0

FCOORD
1
0 0 1 0 1.0

BCOORD
1
0 -1.0
"""
    path = tmp_path / "psdvar.cbf"
    path.write_text(text)
    from hypatia_tpu.interface.cbf import read_cbf
    from hypatia_tpu import Solver

    model = read_cbf(str(path))
    solver = Solver()
    solver.load(model)
    solver.solve()
    assert solver.get_status() == "Optimal"
    assert abs(solver.get_primal_obj() - 1.0) < 1e-6


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
