"""Benchmark driver: prints ONE JSON line with the headline metric.

Primary metric: IPM iterations/s on the MXU-scale LP (linearopt m=1000
n=2000, Schur dim 1000) — the regime the TPU design targets. The round-1/2
headline config (m=128) is latency-bound: a single CPU thread runs its
1.6 ms iterations faster than any accelerator round trip, so it stays as a
secondary entry (BASELINE.md "baseline correction" section). Also runs the
other BASELINE.json configs (portfolio SOCP, doptimaldesign logdet,
polymin WSOS, relentrentanglement quantum RE) and the batched-instance
throughput.

vs_baseline semantics: ratio of measured TPU iterations/s to a MEASURED
single-thread CPU run of this same solver on the same instance (subprocess
with XLA forced to one CPU device and intra-op threads pinned to 1).  The
reference publishes no absolute numbers in-repo and Julia is not available
in this environment (BASELINE.md), so the single-thread CPU run of the
identical algorithm is the documented reproducible proxy for "single-thread
reference on this host". If the baseline subprocess fails, vs_baseline is
reported as null — never a fabricated constant (the round-1/2 "4.73x" was
unknowingly computed against an exception-fallback constant; see
BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

# Committed record of the measured single-thread CPU baseline (fallback
# denominator when the fresh in-run measurement does not finish before the
# hard deadline — the r3/r4 failure mode where vs_baseline came out null).
_BASELINE_FILE = os.path.join(_REPO_DIR, "benchmarks", "cpu_baseline.json")

_CPU_BASELINE_SNIPPET = r"""
import os, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_multi_thread_eigen=false"
    + " intra_op_parallelism_threads=1").strip()
os.environ["OMP_NUM_THREADS"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
# repo-committed cache: /tmp does not survive between builder and driver
# sessions (r03 evidence), the repo workspace does.  Path is interpolated
# from the parent's __file__-derived dir so invoking bench.py from outside
# the repo root still shares the same cache (ADVICE r4).
jax.config.update("jax_compilation_cache_dir", %r)
# persist EVERYTHING including micro-ops: each eager op dispatch is a
# remote-compile RPC on the tunneled TPU (~0.5-20 s each, ~250 s of the
# r5 prime run); as cache hits they cost ~20 ms
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import examples
from hypatia_tpu import Solver
m, n = %d, %d
def run(seed):
    model = examples.linearopt.build(m=m, n=n, seed=seed)
    s = Solver(verbose=False, fused=True, iter_limit=200,
               default_tol_relax=10)
    s.load(model)
    s.solve()
    return s
run(2)  # warm the compile cache
t0 = time.time()
s = run(1)
step_s = s.timers.get("step", time.time() - t0)
print(json.dumps({"iters": s.get_num_iters(), "step_s": step_s,
                  "iters_per_s": s.get_num_iters() / max(step_s, 1e-9)}))
"""


def measure_cpu_baseline(m=1000, n=2000, timeout=900, cache_dir=None):
    """Single-thread CPU run of this solver on the primary config, in a
    subprocess so the TPU process's backend choice is not disturbed.

    Failure returns iters_per_s=None (the caller falls back to the
    committed measurement, clearly labeled) — never a fabricated
    denominator."""
    cache_dir = cache_dir or os.path.join(_REPO_DIR, ".jax_cache")
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             _CPU_BASELINE_SNIPPET % (cache_dir, m, n)],
            capture_output=True, text=True, timeout=timeout)
        line = out.stdout.strip().splitlines()[-1]
        res = json.loads(line)
        res["source"] = "fresh measurement (this run)"
        return res
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}", "iters_per_s": None}


def load_committed_baseline():
    """Committed fallback denominator (benchmarks/cpu_baseline.json)."""
    try:
        with open(_BASELINE_FILE) as f:
            rec = json.load(f)
        return {"iters_per_s": rec["iters_per_s"],
                "source": f"committed measurement ({rec.get('note', '')})"}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}", "iters_per_s": None}


def run_config(mod, params, iter_limit=200, warm=True, tol_relax=10,
               profile=False):
    from hypatia_tpu import Solver

    model = mod.build(**params)
    if warm:
        # compile on identical structure (different instance data)
        wparams = dict(params)
        wparams["seed"] = params.get("seed", 1) + 1
        wmodel = mod.build(**wparams)
        ws = Solver(verbose=False, fused=True, iter_limit=iter_limit,
                    default_tol_relax=tol_relax)
        ws.load(wmodel)
        ws.solve()
    solver = Solver(verbose=False, fused=True, iter_limit=iter_limit,
                    default_tol_relax=tol_relax)
    solver.load(model)
    t0 = time.time()
    solver.solve()
    wall = time.time() - t0
    out = {
        "status": solver.get_status(),
        "iters": solver.get_num_iters(),
        "obj": solver.get_primal_obj(),
        "solve_s": round(wall, 4),
        "step_s": round(solver.timers.get("step", wall), 4),
        "iters_per_s": round(solver.get_num_iters()
                             / max(solver.timers.get("step", wall), 1e-9), 2),
    }
    if profile:
        # reference-parity per-phase timers (upsys/upfact/uprhs/getdir/
        # search, `Solvers.jl:87-96`); kkt_ms = factor+solve per iteration
        from hypatia_tpu.solvers.profile import profile_phases
        try:
            out["phases"] = profile_phases(solver)
        except Exception as e:  # noqa: BLE001
            out["phases"] = {"error": f"{type(e).__name__}: {e}"}
    return out


def _device_probe(timeout=420, attempts=2, retry_wait=60,
                  final_timeout=600):
    """Probe device claim + a trivial compile/execute in a subprocess: if
    the TPU pool is wedged (observed twice after a client was killed
    mid-remote-compile: the claim still succeeds in ~10 s but every
    compile/execute RPC hangs forever), fail fast with a diagnostic
    instead of hanging the whole bench run.  The wedge can clear when the
    stale remote session times out, so retry before giving up.  FEW,
    LONG attempts (r4 lesson): every probe kill orphans its in-flight
    remote-compile job, and orphaned jobs serialize the service queue —
    a 3x180s kill-retry loop measurably made the wedge worse, while a
    single patient attempt cleared at ~350-500s. The final attempt gets
    the longest timeout (don't misclassify slow as wedged)."""
    # sitecustomize pins the axon backend regardless of JAX_PLATFORMS, so
    # mirror tests/conftest.py and update the live config too (lets a
    # debug run probe CPU with JAX_PLATFORMS=cpu)
    snippet = (
        "import os, jax;"
        "p = os.environ.get('JAX_PLATFORMS');"
        "p and jax.config.update('jax_platforms', p.split(',')[0]);"
        "d = jax.devices();"
        "print('claimed', d, flush=True);"
        "import jax.numpy as jnp;"
        "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    diag = ""
    for k in range(attempts):
        if k:
            time.sleep(retry_wait)
        last = k == attempts - 1
        tmo = final_timeout if last else timeout
        try:
            out = subprocess.run([sys.executable, "-u", "-c", snippet],
                                 capture_output=True, text=True,
                                 timeout=tmo)
            if out.returncode == 0:
                return True, ""
            diag = (f"probe attempt {k + 1}: rc={out.returncode} "
                    + (out.stderr or "")[-300:])
        except subprocess.TimeoutExpired as e:
            # normalize: POSIX CPython leaves TimeoutExpired.stdout as raw
            # bytes despite text=True; elsewhere it may be str
            so = e.stdout or b""
            so = so if isinstance(so, bytes) else so.encode()
            stage = ("execute hung after claim" if b"claimed" in so
                     else "device claim hung")
            diag = f"probe attempt {k + 1}: {stage} ({tmo}s)"
        if not last:
            print(f"[bench] {diag}; {attempts - k - 1} retries left",
                  file=sys.stderr, flush=True)
    return False, diag


def main():
    import jax
    import threading

    proc_t0 = time.time()

    # CPU single-thread baseline: launched FIRST, concurrently (it needs
    # no TPU).  r3/r4 lesson: measuring it last meant any deadline killed
    # it and vs_baseline came out null (VERDICT r4 weak #1).
    cpu_base_box = {}

    def _measure_baseline():
        cpu_base_box["res"] = measure_cpu_baseline(timeout=850)

    base_thread = threading.Thread(target=_measure_baseline, daemon=True)
    base_thread.start()

    # HARD deadline watchdog measured FROM PROCESS START (ADVICE r4: the
    # driver's ~900 s kill is from process start; starting the watchdog
    # after a slow device probe could let the driver kill us first).  At
    # the deadline it emits the JSON line with every completed config and
    # exits 0 so the record is ALWAYS parseable.
    per_config = {}
    emit_lock = threading.Lock()
    emitted = []
    job_names_box = {"names": []}

    def emit_result():
        with emit_lock:
            if emitted:
                return None
            emitted.append(True)
        # conservative denominator: the FASTEST available single-thread
        # measurement.  The in-run measure shares the host with the TPU
        # process's staging/dispatch work, so it can read LOW (2.99 it/s
        # observed vs 5.49 committed), which would inflate vs_baseline —
        # prefer the larger of (fresh, committed), report both.
        fresh = cpu_base_box.get("res")
        committed = load_committed_baseline()
        cands = [c for c in (fresh, committed) if c and c.get("iters_per_s")]
        if cands:
            cpu_base = dict(max(cands, key=lambda c: c["iters_per_s"]))
            cpu_base["fresh_measurement"] = (
                fresh.get("iters_per_s", fresh.get("error"))
                if fresh else "not finished")
        else:
            cpu_base = {"iters_per_s": None,
                        "error": (fresh or {}).get("error", "not finished"),
                        "committed_error": committed.get("error")}
        primary = per_config.get("linearopt_1k", {})
        iters_per_s = primary.get("iters_per_s", 0.0) or 0.0
        base = cpu_base.get("iters_per_s")
        result = {
            "metric": "linearopt_lp_2000_ipm_iterations_per_s",
            "value": iters_per_s,
            "unit": "iters/s",
            "vs_baseline": (round(iters_per_s / base, 3) if base else None),
            "cpu_singlethread_baseline": cpu_base,
            "configs": dict(per_config),
        }
        print(json.dumps(result), flush=True)
        return result

    def _watchdog():
        for name in job_names_box["names"]:
            per_config.setdefault(
                name, {"status": "SKIPPED: hard deadline (in flight or "
                                 "not started)"})
        print("[bench] HARD deadline hit: emitting partial record",
              file=sys.stderr, flush=True)
        emit_result()
        sys.stderr.flush()
        os._exit(0)

    hard_deadline_s = float(os.environ.get("BENCH_HARD_DEADLINE_S", "820"))
    watchdog = threading.Timer(
        max(10.0, hard_deadline_s - (time.time() - proc_t0)), _watchdog)
    watchdog.daemon = True
    watchdog.start()

    ok, diag = _device_probe()
    if not ok:
        print(json.dumps({
            "metric": "linearopt_lp_256_ipm_iterations_per_s",
            "value": 0.0, "unit": "iters/s", "vs_baseline": 0.0,
            "error": "device unavailable (claim/compile probe failed)",
            "probe_diag": diag,
            "note": "see BASELINE.md 'Measured (round 2)' for the last "
                    "successful on-chip measurements (all five configs "
                    "Optimal; linearopt 72.4 it/s)",
        }))
        return

    # persistent compile cache: TPU remote compiles are slow (~minutes for
    # the big fused programs); cache compiled binaries across runs.
    # Repo-local by default: /tmp evidently does NOT survive between the
    # builder session and the driver's bench run (r03: doptimaldesign
    # recompiled 608 s despite a primed /tmp cache), while the repo
    # workspace does.  Override with JAX_COMPILATION_CACHE_DIR.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist EVERYTHING including micro-ops: each eager op dispatch is a
    # remote-compile RPC on the tunneled TPU (~0.5-20 s each, ~250 s of the
    # r5 prime run); as cache hits they cost ~20 ms
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import hypatia_tpu  # noqa: F401
    import examples

    # Order = skip priority under the wall-clock budget: the primary
    # metric first (must never be skipped), then the cheap configs, and
    # the compile-heavy doptimaldesign LAST (608 s cold compile ate the
    # whole r03 budget and starved polymin/relentr/batch32).
    configs = [
        # primary: MXU-scale LP (Schur dim 1000)
        ("linearopt_1k", examples.linearopt, dict(m=1000, n=2000)),
        ("linearopt", examples.linearopt, dict(m=128, n=256)),
        ("portfolio", examples.portfolio, dict(num_stocks=100)),
        ("polymin", examples.polymin, dict(poly="univariate_quartic")),
        ("relentr", examples.relentrentanglement, dict(na=2, nb=2)),
        ("doptimaldesign", examples.doptimaldesign,
         dict(q=10, p=30, n=60, n_max=6, use_logdet=True)),
    ]
    if os.environ.get("BENCH_FAST"):
        configs = configs[:1]

    # batched-instance throughput: the TPU-native scaling mode
    def run_batch(nb=32, m=64, n=128):
        from hypatia_tpu.parallel import solve_batch
        models = [examples.linearopt.build(m=m, n=n, seed=s)
                  for s in range(nb)]
        # warm up at the SAME batch size (vmap shape is part of the program)
        warm = [examples.linearopt.build(m=m, n=n, seed=1000 + s)
                for s in range(nb)]
        solve_batch(warm, solver_options=dict(default_tol_relax=10))
        t0 = time.time()
        res = solve_batch(models, solver_options=dict(default_tol_relax=10))
        wall = time.time() - t0
        tot_iters = sum(r["num_iters"] for r in res)
        n_opt = sum(r["status"] == "Optimal" for r in res)
        from hypatia_tpu.parallel import batch as pbatch
        tm = dict(pbatch.LAST_TIMERS)
        device_s = tm.get("solve_s", wall)
        row = {"batch": nb, "optimal": n_opt,
               "total_iters": tot_iters, "solve_s": round(wall, 3),
               "agg_iters_per_s": round(tot_iters / wall, 1),
               "device_solve_s": round(device_s, 3),
               "device_agg_iters_per_s": round(tot_iters / device_s, 1),
               "staging_s": round(tm.get("staging_s", 0.0), 3)}
        # per-stage staging breakdown (host QR vs packed upload etc.) so
        # the bench record localizes any staging regression
        for k, v in sorted(tm.items()):
            if k.startswith("stage_") or k == "finalize_s":
                row[k] = round(v, 3)
        return row

    # heterogeneous batch: mixed structures bucketed by solve_many — the
    # reference benchmark protocol solves DIVERSE instances
    # (`examples/setup.jl:93-128`), not 32 identical LPs
    def run_hetero():
        from hypatia_tpu.parallel import solve_many
        def mk(seed0):
            return ([examples.linearopt.build(m=48, n=96, seed=seed0 + s)
                     for s in range(8)]
                    + [examples.linearopt.build(m=64, n=128, seed=seed0 + s)
                       for s in range(8)]
                    + [examples.portfolio.build(num_stocks=50,
                                                seed=seed0 + s)
                       for s in range(8)])
        solve_many(mk(1000), solver_options=dict(default_tol_relax=10))
        models = mk(0)
        t0 = time.time()
        res = solve_many(models, solver_options=dict(default_tol_relax=10))
        wall = time.time() - t0
        tot_iters = sum(r["num_iters"] for r in res)
        return {"batch": len(models), "buckets": 3,
                "optimal": sum(r["status"] == "Optimal" for r in res),
                "total_iters": tot_iters, "solve_s": round(wall, 3),
                "agg_iters_per_s": round(tot_iters / wall, 1)}

    # wall-clock budget: gates config *starts*; the process-start watchdog
    # above is the hard stop.  With a primed persistent compile cache every
    # config runs in seconds and neither ever binds.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    bench_t0 = time.time()

    def remaining():
        return budget_s - (time.time() - bench_t0)

    # skip priority: batch32 before the compile-heavy doptimaldesign;
    # hetero24 LAST — its three bucket programs may compile fresh, and a
    # bonus row must never starve the seven certified configs
    jobs = ([(n, m, p) for n, m, p in configs[:-1]]
            + [("batch32_lp128", None, None)]
            + [configs[-1]]
            + [("hetero24_mixed", None, None)]) if len(configs) > 1 \
        else list(configs)
    job_names_box["names"] = [name for name, _, _ in jobs]

    for name, mod, params in jobs:
        if remaining() < 60:
            per_config[name] = {"status": "SKIPPED: bench budget exhausted"}
            continue
        print(f"[bench] {name} ... ({remaining():.0f}s budget left)",
              file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            if name == "batch32_lp128":
                per_config[name] = run_batch()
            elif name == "hetero24_mixed":
                per_config[name] = run_hetero()
            else:
                # phase profiling compiles ~20 extra program shapes
                # (minutes of remote-compile wall on the tunneled TPU) —
                # opt-in only
                prof = (os.environ.get("BENCH_PROFILE", "")
                        and name in ("linearopt", "doptimaldesign"))
                res = run_config(mod, params, tol_relax=10, profile=prof)
                res["tol_relax"] = 10
                if (name == "relentr" and res["status"] != "Optimal"
                        and remaining() > 60):
                    # quantum RE retry at extra relaxation (TPU eigh
                    # accuracy)
                    res = run_config(mod, params, tol_relax=100)
                    res["tol_relax"] = 100
                per_config[name] = res
        except Exception as e:  # keep the bench robust
            per_config[name] = {"status": f"ERROR: {type(e).__name__}: {e}"}
        print(f"[bench] {name} done in {time.time()-t0:.1f}s: "
              f"{per_config[name]}", file=sys.stderr, flush=True)

    # wait (bounded) for the concurrently-launched CPU baseline; the
    # committed fallback covers a timeout
    base_thread.join(timeout=max(10.0, min(300.0, remaining())))
    res = cpu_base_box.get("res")
    print("[bench] cpu baseline: "
          + str(res if res else "still running; using committed fallback"),
          file=sys.stderr, flush=True)
    committed_now = load_committed_baseline().get("iters_per_s") or 0.0
    if res and (res.get("iters_per_s") or 0.0) > committed_now:
        # refresh the committed fallback record ONLY UPWARD: concurrent
        # TPU host work depresses the in-run measure, and a low committed
        # denominator would inflate future vs_baseline claims
        try:
            with open(_BASELINE_FILE, "w") as f:
                json.dump({"iters_per_s": res["iters_per_s"],
                           "iters": res.get("iters"),
                           "step_s": res.get("step_s"),
                           "note": "linearopt m=1000 n=2000, 1-thread CPU, "
                                   "auto-refreshed by bench.py"}, f,
                          indent=1)
        except OSError:
            pass
    watchdog.cancel()
    emit_result()


if __name__ == "__main__":
    main()
