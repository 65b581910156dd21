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

# quick smoke tier (`pytest -m quick`): the FIRST minimal instance of each
# family — one end-to-end solve per family in minutes, vs the full
# minimal sweep for long runs
_seen_families = set()
_PARAMS = []
for _i, (_name, _params) in enumerate(CASES):
    _marks = [pytest.mark.quick] if _name not in _seen_families else []
    _seen_families.add(_name)
    _PARAMS.append(pytest.param(_name, _params, id=f"{_name}-{_i}",
                                marks=_marks))

_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """The XLA CPU client segfaults after accumulating hundreds of
    compiled programs in one process; drop compiled state every few
    solves (mirrors benchmarks/run.py)."""
    yield
    _counter["n"] += 1
    if _counter["n"] % 6 == 0:
        import jax

        jax.clear_caches()


@pytest.mark.parametrize("name,params", _PARAMS)
def test_minimal_instance(name, params):
    # reference example-test protocol uses relaxed tolerances
    # (`test/runexamplestests.jl` + `runnativetests.jl:14-18`
    # default_tol_relax=10); families may override via TEST_OPTIONS /
    # TEST_VIOL_BOUND (the reference's per-instance relaxed_tols)
    mod = examples.FAMILIES[name]
    opts = getattr(mod, "TEST_OPTIONS", dict(default_tol_relax=10))
    viol_bound = getattr(mod, "TEST_VIOL_BOUND", 1e-6)
    record = run_instance(mod, params, solver_options=opts)
    assert record["status"] == "Optimal", record
    # relative certificate-violation bound under the relaxed stop
    # tolerances (residuals normalized as in `Solvers.jl:485-528`)
    assert record["max_viol"] < viol_bound, record
