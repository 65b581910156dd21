"""Examples as end-to-end tests: minimal instance set of each family
(parity with `test/runexamplestests.jl:25-31`)."""

import numpy as np
import pytest

import examples
from examples.common import run_instance


CASES = [
    (name, params)
    for name, mod in examples.FAMILIES.items()
    for params in mod.MINIMAL
]


@pytest.mark.parametrize("name,params", CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_minimal_instance(name, params):
    # reference example-test protocol uses relaxed tolerances
    # (`test/runexamplestests.jl` + `runnativetests.jl:14-18`
    # default_tol_relax=10)
    record = run_instance(examples.FAMILIES[name], params,
                          solver_options=dict(default_tol_relax=10))
    assert record["status"] == "Optimal", record
    # certificate-violation bound under the 10x-relaxed stop tolerances;
    # un-rescaling can amplify the internal residual by a small factor
    # (the reference's relaxed protocol checks objectives at ~eps^0.25,
    # far looser than this)
    assert record["max_viol"] < 2e-6, record
