"""Per-phase device timing of one IPM iteration (scan-of-probes method).

The reference accumulates host wall-clock per sub-procedure
(`src/Solvers/Solvers.jl:87-96`: time_upsys/upfact/uprhs/getdir/search).
Inside a fused TPU program host timers are meaningless, and per-op device
profiles are unavailable over the remote tunnel, so phases are timed by
*nested probe programs*: probe k executes phases 1..k of the step, chained
N times inside one `lax.scan` (data-dependent carry so XLA cannot hoist or
CSE across repetitions).  Phase time = (probe_k - probe_{k-1}) wall time
per repetition; the scan amortizes the ~30 ms program-dispatch floor.

Phases (cumulative probes):
  aux     compute_iter_aux: per-cone point_aux + grads  [upsys part 1]
  upsys   + update_lhs (Schur assembly + factorization) [time_upsys/upfact]
  dirs    + 4 RHS builds + 4 direction solves w/ refinement [uprhs+getdir]
  step    + batched curve search + point update         [time_search]

Usage: python benchmarks/profile_step.py [config ...]
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.solvers import steppers, syssolvers
from hypatia_tpu.solvers.structures import compute_iter_aux, point_vec


def _leaf_sum(tree):
    leaves = [jnp.sum(jnp.real(x)) for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                        jnp.inexact)]
    return sum(leaves)


def make_probes(ctx, data):
    """Return dict of cumulative probe fns pt -> scalar."""

    def probe_aux(pt):
        iter_aux = compute_iter_aux(ctx, pt)
        return _leaf_sum(iter_aux["grads"]) + iter_aux["mu"]

    def probe_upsys(pt):
        iter_aux = compute_iter_aux(ctx, pt)
        sys = syssolvers.update_lhs(ctx, data, iter_aux)
        return _leaf_sum(sys) + iter_aux["mu"]

    def _dirs(pt):
        iter_aux = compute_iter_aux(ctx, pt)
        sys = syssolvers.update_lhs(ctx, data, iter_aux)
        residuals = {
            "x": jnp.zeros(ctx.n, dtype=ctx.dtype),
            "y": jnp.zeros(ctx.p, dtype=ctx.dtype),
            "z": jnp.zeros(ctx.q, dtype=ctx.dtype),
            "tau": jnp.ones((), dtype=ctx.dtype),
        }
        cutoff = jnp.asarray(1e-10, dtype=ctx.dtype)
        getdir = lambda rhs: syssolvers.get_directions(
            ctx, data, iter_aux, sys, rhs, cutoff)
        d1, _ = getdir(steppers.update_rhs_cent(ctx, iter_aux, pt))
        d2, _ = getdir(steppers.update_rhs_centadj(ctx, iter_aux, pt, d1))
        d3, _ = getdir(steppers.update_rhs_pred(ctx, iter_aux, residuals, pt))
        d4, _ = getdir(steppers.update_rhs_predadj(ctx, iter_aux, pt, d3))
        return iter_aux, {"cent": d1, "centadj": d2, "pred": d3,
                          "predadj": d4}

    def probe_dirs(pt):
        _, dirs = _dirs(pt)
        return sum(_leaf_sum(d) for d in dirs.values())

    def probe_step(pt):
        _, dirs = _dirs(pt)
        found, alpha, proxsqr, mode = steppers._search_cascade(
            ctx, pt, dirs, (0, 1, 2, 3) if ctx.use_adjustment else (1, 3))
        return (sum(_leaf_sum(d) for d in dirs.values())
                + alpha + proxsqr + mode)

    return {"aux": probe_aux, "upsys": probe_upsys, "dirs": probe_dirs,
            "step": probe_step}


def time_probe(probe, pt, reps=12):
    """Wall time per repetition of `probe` chained `reps` times in one
    program (minus the empty-program dispatch floor)."""

    @jax.jit
    def run(pt):
        def body(carry, _):
            p, acc = carry
            out = probe(p)
            # data-dependent chaining: nudge the point by an
            # outcome-dependent epsilon so XLA cannot CSE the repetitions
            bump = 1.0 + 1e-300 * out
            p2 = jax.tree_util.tree_map(lambda x: x * bump, p)
            return (p2, acc + out), None

        (p, acc), _ = jax.lax.scan(body, (pt, 0.0), None, length=reps)
        return acc

    run(pt).block_until_ready()  # compile
    t0 = time.time()
    run(pt).block_until_ready()
    return (time.time() - t0) / reps


def dispatch_floor():
    @jax.jit
    def empty(x):
        return x + 1.0

    x = jnp.zeros(())
    empty(x).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.time()
        empty(x).block_until_ready()
        ts.append(time.time() - t0)
    return min(ts)


def profile_solver(solver, reps=12):
    """Phase breakdown (ms/iter) at the solver's final iterate. The solver
    must have been solved in fused mode (ctx/data/final point retained)."""
    ctx, data = solver.ctx, solver.data
    pt = solver.final_point
    probes = make_probes(ctx, data)
    floor = dispatch_floor()
    raw = {}
    for name, probe in probes.items():
        raw[name] = time_probe(probe, pt, reps) - floor / reps
    out = {
        "aux_ms": 1e3 * raw["aux"],
        "upsys_ms": 1e3 * (raw["upsys"] - raw["aux"]),
        "getdir_ms": 1e3 * (raw["dirs"] - raw["upsys"]),
        "search_ms": 1e3 * (raw["step"] - raw["dirs"]),
        "total_ms": 1e3 * raw["step"],
        "kkt_ms": 1e3 * (raw["dirs"] - raw["aux"]),
    }
    return {k: round(v, 3) for k, v in out.items()}


def main():
    import os
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import examples
    from hypatia_tpu import Solver

    configs = {
        "linearopt": (examples.linearopt, dict(m=128, n=256)),
        "portfolio": (examples.portfolio, dict(num_stocks=100)),
        "doptimaldesign": (examples.doptimaldesign,
                           dict(q=10, p=30, n=60, n_max=6, use_logdet=True)),
        "polymin": (examples.polymin, dict(poly="univariate_quartic")),
        "relentr": (examples.relentrentanglement, dict(na=2, nb=2)),
    }
    import sys
    names = sys.argv[1:] or list(configs)
    results = {}
    for name in names:
        mod, params = configs[name]
        model = mod.build(**params)
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=100 if name == "relentr" else 10)
        s.load(model)
        s.solve()
        results[name] = profile_solver(s)
        results[name]["status"] = s.get_status()
        print(name, results[name], file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
