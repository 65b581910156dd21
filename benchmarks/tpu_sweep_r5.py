"""Round-5 consolidated on-chip measurement driver.

One long-lived process for the round-5 TPU measurements (compile-service
discipline: never kill mid-compile, one session for everything).

Stages (priority order):
  tight        all bench configs at relax=1 (VERDICT r4 item 4) — the
               tols are traced values, so these reuse the cached relax=10
               programs and cost only solve time
  dprofile     doptimaldesign q=100 per-phase device profile (item 3)
  nearestpsd   side-100 compile attempt after the program-size fix
               (item 2; CPU proxy 0.372 it/s)
  manycone     1000-cone instance end-to-end on-chip (item 5)
  gp9          polymin goldsteinprice halfdeg=9 vs its 51.2 it/s CPU
               proxy (item 7)

Run from repo root: python -u benchmarks/tpu_sweep_r5.py [stages...]
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import examples  # noqa: E402
from hypatia_tpu import Solver  # noqa: E402

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


def stage_tight(out):
    jobs = [
        ("linearopt_1k", examples.linearopt, dict(m=1000, n=2000)),
        ("linearopt", examples.linearopt, dict(m=128, n=256)),
        ("portfolio", examples.portfolio, dict(num_stocks=100)),
        ("polymin", examples.polymin, dict(poly="univariate_quartic")),
        ("relentr", examples.relentrentanglement, dict(na=2, nb=2)),
        ("doptimaldesign", examples.doptimaldesign,
         dict(q=10, p=30, n=60, n_max=6, use_logdet=True)),
    ]
    for name, mod, params in jobs:
        if left() < 120:
            return
        t0 = time.time()
        try:
            row = run_once(mod, params, relax=1)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"}
        out[f"tight_{name}"] = emit("tight", name, row, t0)
    # batched tight arm
    if left() < 120:
        return
    t0 = time.time()
    try:
        from hypatia_tpu.parallel import solve_batch
        models = [examples.linearopt.build(m=64, n=128, seed=s)
                  for s in range(32)]
        warm = [examples.linearopt.build(m=64, n=128, seed=1000 + s)
                for s in range(32)]
        solve_batch(warm, solver_options=dict(default_tol_relax=1))
        tt = time.time()
        res = solve_batch(models, solver_options=dict(default_tol_relax=1))
        wall = time.time() - tt
        row = {"optimal": sum(r["status"] == "Optimal" for r in res),
               "total_iters": sum(r["num_iters"] for r in res),
               "agg_iters_per_s": round(
                   sum(r["num_iters"] for r in res) / wall, 1)}
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"}
    out["tight_batch32"] = emit("tight", "batch32", row, t0)


def stage_dprofile(out):
    if left() < 600:
        return
    t0 = time.time()
    try:
        model = examples.doptimaldesign.build(q=100, p=300, n=600,
                                              n_max=60, use_logdet=True)
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=10)
        s.load(model)
        s.solve()
        row = dict(status=s.get_status(), iters=s.get_num_iters(),
                   step_s=round(s.timers.get("step", 0.0), 3),
                   iters_per_s=round(
                       s.get_num_iters()
                       / max(s.timers.get("step", 1e9), 1e-9), 2))
        if os.environ.get("SWEEP_PROFILE"):
            # opt-in: profile_phases compiles ~10 scan-probe programs of
            # the FULL iteration body — ~2 h of remote-compile wall at
            # q=5652 (measured this round); the solve row above is the
            # headline number
            from hypatia_tpu.solvers.profile import profile_phases
            row["phases"] = profile_phases(s)
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"}
    out["doptimaldesign_q100_profile"] = emit("dprofile", "q100", row, t0)


def stage_nearestpsd60(out):
    """Largest sparse-PSD side that compiles on the remote helper
    (side-100 still OOMs it at ~6 MB MLIR after the constant dedup);
    1-thread CPU proxy measured round 5: 1.722 it/s (15 iters)."""
    for name, params in [("nearestpsd_60", dict(side=60))]:
        if left() < 600:
            return
        t0 = time.time()
        try:
            row = run_once(examples.nearestpsd, params, 10)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
        out[name] = emit("nearestpsd60", name, row, t0)


def stage_nearestpsd(out):
    for name, params in [("nearestpsd_100", dict(side=100))]:
        if left() < 600:
            return
        t0 = time.time()
        try:
            row = run_once(examples.nearestpsd, params, 10)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
        out[name] = emit("nearestpsd", name, row, t0)


def stage_manycone(out):
    from benchmarks.manycone_r4 import build_manycone

    if left() < 600:
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
                   solve_s=round(wall, 3),
                   iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
    out["manycone_1000"] = emit("manycone", "folded", row, t0)


def stage_gp9(out):
    if left() < 600:
        return
    t0 = time.time()
    try:
        row = run_once(examples.polymin,
                       dict(poly="goldsteinprice", halfdeg=9), 10)
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
    out["polymin_gp9"] = emit("gp9", "polymin_gp9", row, t0)


def stage_manycone2(out):
    """Well-posed 1000-cone instance (nx=1500): Optimal in 26 iters at
    1.62 it/s on CPU (round-5 diagnosis — the nx=400 instance's
    NearOptimal is slack-cone degeneracy, not a solver gap)."""
    from benchmarks.manycone_r4 import build_manycone

    if left() < 600:
        return
    t0 = time.time()
    try:
        model = build_manycone(nx=1500)
        warm = build_manycone(nx=1500, seed=4)
        for mdl in (warm, model):
            s = Solver(verbose=False, fused=True, iter_limit=200,
                       default_tol_relax=10)
            s.load(mdl)
            tt = time.time()
            s.solve()
            wall = time.time() - tt
        st = s.timers.get("step", wall)
        row = dict(status=s.get_status(), iters=s.get_num_iters(),
                   solve_s=round(wall, 3),
                   iters_per_s=round(s.get_num_iters() / max(st, 1e-9), 2))
    except Exception as e:  # noqa: BLE001
        row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
    out["manycone_1000_nx1500"] = emit("manycone2", "nx1500", row, t0)


def stage_ddoff_polymin(out):
    """polymin tight-tolerance dd-off arm: CPU passes relax=1, TPU
    (dd default-on) is NearOptimal at gap ~6e-8 — isolate the Pallas dd
    factorization's contribution."""
    if left() < 600:
        return
    os.environ["HYPATIA_TPU_NO_PALLAS_DD"] = "1"
    jax.clear_caches()  # env read at trace time
    try:
        for relax in (1, 10):
            t0 = time.time()
            try:
                row = run_once(examples.polymin,
                               dict(poly="univariate_quartic"), relax)
            except Exception as e:  # noqa: BLE001
                row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
            out[f"polymin_ddoff_relax{relax}"] = emit(
                "ddoff", f"polymin_relax{relax}", row, t0)
    finally:
        os.environ.pop("HYPATIA_TPU_NO_PALLAS_DD", None)
        jax.clear_caches()


def stage_conelat(out):
    """Per-cone-oracle latency table ON TPU (VERDICT r4 item 3: the CPU
    table identified point_aux as the 5-50x dominator; this measures the
    same oracles on-chip)."""
    from hypatia_tpu import cones
    from benchmarks.cone_latency_r5 import bench_cone

    jobs = []
    for side in (30, 100):
        sd = side * (side + 1) // 2
        jobs.append((f"possemideftri_{side}", cones.PosSemidefTri(sd)))
    jobs.append(("sepspectral_mat_neglog_30",
                 cones.EpiPerSepSpectralMatrix(cones.NegLogSSF(), 30)))
    sd = 12 * 13 // 2
    jobs.append(("epitrrelentropy_12", cones.EpiTrRelEntropyTri(2 * sd + 1)))
    for name, cone in jobs:
        if left() < 300:
            return
        t0 = time.time()
        try:
            row = bench_cone(name, cone)
        except Exception as e:  # noqa: BLE001
            row = {"status": f"ERROR: {type(e).__name__}: {e}"[:300]}
        out[f"conelat_{name}"] = emit("conelat", name, row, t0)


def stage_bgetdir(out):
    """Opt-in 2x2 batched direction-solve A/B (halves sequential depth of
    the latency-bound solve chains; CPU A/B shows identical iterates)."""
    jobs = [("doptimaldesign_q100", examples.doptimaldesign,
             dict(q=100, p=300, n=600, n_max=60, use_logdet=True)),
            ("linearopt_1k", examples.linearopt, dict(m=1000, n=2000)),
            ("relentr", examples.relentrentanglement, dict(na=2, nb=2))]
    os.environ["HYPATIA_TPU_BATCHED_GETDIR"] = "1"
    jax.clear_caches()
    try:
        for name, mod, params in jobs:
            if left() < 600:
                return
            t0 = time.time()
            try:
                row = run_once(mod, params, 10)
            except Exception as e:  # noqa: BLE001
                row = {"status": f"ERROR: {type(e).__name__}: {e}"[:600]}
            out[f"bgetdir_{name}"] = emit("bgetdir", name, row, t0)
    finally:
        os.environ.pop("HYPATIA_TPU_BATCHED_GETDIR", None)
        jax.clear_caches()


STAGES = {"tight": stage_tight, "dprofile": stage_dprofile,
          "nearestpsd": stage_nearestpsd,
          "nearestpsd60": stage_nearestpsd60, "manycone": stage_manycone,
          "manycone2": stage_manycone2, "ddoff_polymin": stage_ddoff_polymin,
          "conelat": stage_conelat, "bgetdir": stage_bgetdir,
          "gp9": stage_gp9}


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    names = sys.argv[1:] or ["tight", "dprofile", "nearestpsd", "manycone",
                             "gp9"]
    out = {"backend": jax.default_backend()}
    for name in names:
        print(f"=== stage {name} ({left():.0f}s left) ===", flush=True)
        STAGES[name](out)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
