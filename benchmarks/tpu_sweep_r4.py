"""Round-4 consolidated on-chip measurement driver.

One long-lived process for ALL remaining round-4 TPU measurements — the
remote-compile service pays a large per-session penalty (and orphaned
jobs from killed sessions serialize its queue), so subprocess-per-config
A/Bs are replaced by in-process env flips + jax.clear_caches() between
arms (the dispatch policies read os.environ at trace time).

Stages (priority order, each wall-budgeted and individually fused):
  relentr   quantum RE on-chip at relax 10/1 + na3nb3 (VERDICT r3 item 3)
  large     MXU-scale non-LP families (VERDICT r3 item 2)
  dd_ab     Pallas dd tight-tolerance A/B (VERDICT r3 weak 4)
  manycone  1000-cone assembly fold A/B + end-to-end (VERDICT r3 item 7)

Run from repo root: python -u benchmarks/tpu_sweep_r4.py [stages...]
Results stream as JSON lines; final line is "RESULT {...}".
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_p = os.environ.get("JAX_PLATFORMS")
if _p:  # sitecustomize pins axon; honor an explicit platform override
    jax.config.update("jax_platforms", _p.split(",")[0])
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import examples
from hypatia_tpu import Solver

T0 = time.time()
BUDGET_S = float(os.environ.get("SWEEP_BUDGET_S", "100000"))


def left():
    return BUDGET_S - (time.time() - T0)


def run_once(mod, params, relax, iter_limit=200, **solver_kw):
    model = mod.build(**params)
    warm = mod.build(**{**params, "seed": params.get("seed", 1) + 1})
    for mdl in (warm, model):
        s = Solver(verbose=False, fused=True, iter_limit=iter_limit,
                   default_tol_relax=relax, **solver_kw)
        s.load(mdl)
        t0 = time.time()
        s.solve()
        wall = time.time() - t0
    st = s.timers.get("step", wall)
    return dict(status=s.get_status(), iters=s.get_num_iters(),
                obj=float(s.get_primal_obj()), solve_s=round(wall, 3),
                iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))


def emit(stage, name, row, t0):
    row["wall_s"] = round(time.time() - t0, 1)
    print(f"[{stage}] {name}: {json.dumps(row)}", flush=True)
    return row


def stage_relentr(out):
    jobs = [("na2nb2_relax10", dict(na=2, nb=2), 10),
            ("na2nb2_relax1", dict(na=2, nb=2), 1),
            ("na3nb3_relax10", dict(na=3, nb=3), 10)]
    for name, params, relax in jobs:
        if left() < 120:
            return
        t0 = time.time()
        try:
            row = run_once(examples.relentrentanglement, params, relax)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"}
        out[f"relentr_{name}"] = emit("relentr", name, row, t0)


def stage_large(out):
    jobs = [
        ("doptimaldesign_q100", examples.doptimaldesign,
         dict(q=100, p=300, n=600, n_max=60, use_logdet=True)),
        ("nearestpsd_100", examples.nearestpsd, dict(side=100)),
        # side-100 hit a compile-helper OOM (9.7 MB MLIR program; see
        # BASELINE.md round-4 late-session note) — side-60 sizes the
        # family's MXU story while the program-size fix is pending
        ("nearestpsd_60", examples.nearestpsd, dict(side=60)),
    ]
    for name, mod, params in jobs:
        if left() < 300:
            return
        t0 = time.time()
        try:
            row = run_once(mod, params, 10)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"}
        out[name] = emit("large", name, row, t0)


def stage_dd_ab(out):
    jobs = [("linearopt", examples.linearopt, dict(m=128, n=256)),
            ("nearestpsd30", examples.nearestpsd, dict(side=30))]
    for arm, env in (("dd_on", None), ("dd_off", "1")):
        if left() < 300:
            return
        if env is None:
            os.environ.pop("HYPATIA_TPU_NO_PALLAS_DD", None)
        else:
            os.environ["HYPATIA_TPU_NO_PALLAS_DD"] = env
        jax.clear_caches()  # env is read at trace time, not in jit keys
        for name, mod, params in jobs:
            for relax in (10, 1):
                if left() < 120:
                    return
                t0 = time.time()
                try:
                    row = run_once(mod, params, relax)
                except Exception as e:  # noqa: BLE001
                    row = {"status": f"ERROR: {type(e).__name__}: {e}"}
                out[f"{arm}_{name}_relax{relax}"] = emit(
                    "dd_ab", f"{arm}_{name}_relax{relax}", row, t0)
    os.environ.pop("HYPATIA_TPU_NO_PALLAS_DD", None)
    jax.clear_caches()


def stage_manycone(out):
    from benchmarks.manycone_r4 import build_manycone

    if left() < 300:
        return
    t0 = time.time()
    try:
        model = build_manycone()
        warm = build_manycone(seed=4)
        for mdl in (warm, model):
            s = Solver(verbose=False, fused=True, iter_limit=200,
                       default_tol_relax=10)
            s.load(mdl)
            tt = time.time()
            s.solve()
            wall = time.time() - tt
        st = s.timers.get("step", wall)
        row = dict(status=s.get_status(), iters=s.get_num_iters(),
                   iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"}
    out["manycone_folded"] = emit("manycone", "folded", row, t0)

    if left() < 300:
        return
    t0 = time.time()
    try:
        os.environ["HYPATIA_TPU_NO_SCHUR_FOLD"] = "1"
        jax.clear_caches()
        for mdl in (build_manycone(seed=5), build_manycone(seed=6)):
            s = Solver(verbose=False, fused=True, iter_limit=200,
                       default_tol_relax=10)
            s.load(mdl)
            tt = time.time()
            s.solve()
            wall = time.time() - tt
        st = s.timers.get("step", wall)
        row = dict(status=s.get_status(), iters=s.get_num_iters(),
                   iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"}
    finally:
        os.environ.pop("HYPATIA_TPU_NO_SCHUR_FOLD", None)
        jax.clear_caches()
    out["manycone_twomatmul"] = emit("manycone", "two_matmul", row, t0)


def stage_polymin(out):
    if left() < 300:
        return
    t0 = time.time()
    try:
        row = run_once(examples.polymin,
                       dict(poly="goldsteinprice", halfdeg=9), 10)
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"}
    out["polymin_gp9"] = emit("polymin", "polymin_gp9", row, t0)


STAGES = {"relentr": stage_relentr, "large": stage_large,
          "dd_ab": stage_dd_ab, "manycone": stage_manycone,
          "polymin": stage_polymin}


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    names = sys.argv[1:] or ["relentr", "large", "dd_ab", "manycone"]
    out = {"backend": jax.default_backend()}
    for name in names:
        print(f"=== stage {name} ({left():.0f}s left) ===", flush=True)
        STAGES[name](out)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
