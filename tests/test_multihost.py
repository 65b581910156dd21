"""Multi-host (multi-process) scaffolding validation.

A 2-process CPU launch (2 local devices each -> a (2, 2) hosts x devices
global mesh) must solve the same batch to the same statuses/objectives as
a single-process run — the reference has no analog (single-process
solver, SURVEY.md §2.9); this is the DCN-scaling scaffolding the north
star's 2+ host metric requires.
"""

import json
import os
import sys

import numpy as np
import pytest

import examples
from hypatia_tpu.parallel import solve_batch
from hypatia_tpu.parallel.launch import launch

NB, M, N = 8, 16, 32


@pytest.mark.slow
def test_two_process_cpu_matches_single_process(tmp_path):
    out = tmp_path / "mh.json"
    launch(2, "hypatia_tpu.parallel._mh_demo",
           ["--nb", str(NB), "--m", str(M), "--n", str(N),
            "--out", str(out)],
           local_devices=2, platform="cpu", timeout=600)
    mh = json.loads(out.read_text())
    assert mh["process_count"] == 2
    assert mh["mesh_shape"] == {"hosts": 2, "devices": 2}
    assert len(mh["results"]) == NB

    # single-process reference solve of the identical batch
    models = [examples.linearopt.build(m=M, n=N, seed=s) for s in range(NB)]
    ref = solve_batch(models, solver_options=dict(default_tol_relax=10))

    for r_mh, r_sp in zip(mh["results"], ref):
        assert r_mh["status"] == "Optimal"
        assert r_mh["status"] == r_sp["status"]
        # same algorithm, same data, different device partitioning: the
        # objectives must agree to solver tolerance
        assert r_mh["primal_obj"] == pytest.approx(r_sp["primal_obj"],
                                                   rel=1e-6, abs=1e-6)
        assert abs(r_mh["num_iters"] - r_sp["num_iters"]) <= 2


@pytest.mark.slow
def test_hybrid_mesh_single_process():
    # single-process shape sanity: hybrid_mesh degrades to (1, ndev)
    import jax

    from hypatia_tpu.parallel import multihost

    mesh = multihost.hybrid_mesh()
    assert mesh.shape["hosts"] == 1
    assert mesh.shape["devices"] == len(jax.devices())
