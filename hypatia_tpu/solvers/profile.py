"""Per-phase device timing of one IPM iteration.

Reference parity: the reference accumulates per-phase timers
time_upsys / time_upfact / time_uprhs / time_getdir / time_search per solve
(`src/Solvers/Solvers.jl:87-96`); the KKT factor+solve ms/iter metric in
BASELINE.md derives from upfact+getdir.

On this stack a single program dispatch costs ~30 ms regardless of content,
so phases cannot be timed by wrapping host timers around ops. Instead each
phase is run as a `lax.scan` of N dependent repetitions inside ONE program;
per-iteration time = (t(N) - t(1)) / (N - 1), which cancels both the
dispatch overhead and the scan setup. A tiny output-dependent perturbation
of the inputs defeats loop-invariant code motion (XLA would otherwise hoist
the loop body).
"""

import time

import jax
import jax.numpy as jnp

from hypatia_tpu.solvers import steppers, syssolvers
from hypatia_tpu.solvers.structures import compute_iter_aux


def _perturb(tree, sig):
    """Multiply every leaf by (1 + eps*sig): keeps values numerically
    unchanged but makes each scan iteration depend on the previous
    result, preventing XLA from hoisting the body out of the loop."""
    f = 1.0 + 1e-300 * sig
    return jax.tree_util.tree_map(
        lambda v: v * f if jnp.issubdtype(v.dtype, jnp.inexact) else v, tree)


def _tree_sig(out):
    leaves = [jnp.max(jnp.abs(v), initial=0.0)
              for v in jax.tree_util.tree_leaves(out)
              if jnp.issubdtype(v.dtype, jnp.inexact)]
    sig = sum(leaves)
    return jnp.where(jnp.isfinite(sig), 0.0 * sig, 0.0)


def _vary(tree, eps=1e-13):
    """Value-level input variation: repeated execution of one program with
    IDENTICAL input buffers can short-circuit in the remote-execution layer
    (measured: a 7.2 ms chol chain reads as ~0 with reused inputs), so the
    timed call must see fresh values."""
    return jax.tree_util.tree_map(
        lambda v: v * (1.0 + eps) if jnp.issubdtype(v.dtype, jnp.inexact)
        else v, tree)


def _time_scan(fn, args, n):
    """Wall time of scan-of-n dependent invocations of fn(*args) inside one
    jitted program (blocking on the result)."""

    @jax.jit
    def run(args):
        def body(carry, _):
            a, sig = carry
            out = fn(*a)
            sig2 = sig + _tree_sig(out)
            return (_perturb(a, sig2), sig2), None

        (_, sig), _ = jax.lax.scan(body, (args, jnp.zeros(())), None,
                                   length=n)
        return sig

    run(args).block_until_ready()  # compile + warm
    fresh = _vary(args)
    t0 = time.perf_counter()
    run(fresh).block_until_ready()
    return time.perf_counter() - t0


def _phase_ms(fn, args, n=8):
    t1 = _time_scan(fn, args, 1)
    tn = _time_scan(fn, args, n)
    return max(tn - t1, 0.0) / (n - 1) * 1e3


def profile_phases(solver, n=8):
    """Per-phase device ms/iteration for a loaded+solved Solver.

    Returns dict with upsys/upfact/uprhs/getdir/search ms and the derived
    kkt_ms (upfact + getdir), measured at the solver's final iterate (or
    the initial iterate when the final one is not finite).
    """
    ctx, data = solver.ctx, solver.data
    pt = solver.final_point
    finite = all(bool(jnp.all(jnp.isfinite(v))) for v in pt.values())
    if not finite:
        raise ValueError("final point not finite; profile a successful solve")

    res = {}

    # upsys: scaled-point cone state (point_aux + grads)
    res["upsys_ms"] = _phase_ms(
        lambda pt: compute_iter_aux(ctx, pt), (pt,), n)

    iter_aux = jax.jit(lambda pt: compute_iter_aux(ctx, pt))(pt)

    # upfact: Schur assembly + factorization
    res["upfact_ms"] = _phase_ms(
        lambda d, ia: syssolvers.update_lhs(ctx, d, ia), (data, iter_aux), n)

    sys = jax.jit(lambda d, ia: syssolvers.update_lhs(ctx, d, ia))(
        data, iter_aux)

    # uprhs: the four RHS builders
    zeros = {k: jnp.zeros_like(v) for k, v in pt.items()}
    residuals = {"x": zeros["x"], "y": zeros["y"], "z": zeros["z"],
                 "tau": jnp.ones((), dtype=ctx.dtype)}

    def rhs_all(ia, pt):
        r1 = steppers.update_rhs_cent(ctx, ia, pt)
        r2 = steppers.update_rhs_centadj(ctx, ia, pt, r1)
        r3 = steppers.update_rhs_pred(ctx, ia, residuals, pt)
        r4 = steppers.update_rhs_predadj(ctx, ia, pt, r3)
        return r1, r2, r3, r4

    res["uprhs_ms"] = _phase_ms(rhs_all, (iter_aux, pt), n)
    rhs = jax.jit(lambda ia, pt: steppers.update_rhs_cent(ctx, ia, pt))(
        iter_aux, pt)

    # getdir: one direction solve incl. iterative refinement (x4 per iter)
    cutoff = jnp.asarray(1e-8, dtype=ctx.dtype)

    def getdir(d, ia, sys, rhs):
        dir_, rn = syssolvers.get_directions(ctx, d, ia, sys, rhs, cutoff)
        return dir_, rn

    one_dir_ms = _phase_ms(getdir, (data, iter_aux, sys, rhs), n)
    res["getdir_ms"] = 4 * one_dir_ms  # combined stepper: 4 solves/iter

    # search: full 4-mode cascade over the alpha schedule
    dir_cent = jax.jit(getdir)(data, iter_aux, sys, rhs)[0]
    dirs = {"cent": dir_cent, "centadj": dir_cent,
            "pred": dir_cent, "predadj": dir_cent}

    def search(pt, dirs):
        return steppers._search_cascade(ctx, pt, dirs, (0, 1, 2, 3))

    res["search_ms"] = _phase_ms(search, (pt, dirs), n)

    res["kkt_ms"] = res["upfact_ms"] + res["getdir_ms"]
    res["total_accounted_ms"] = sum(
        res[k] for k in ("upsys_ms", "upfact_ms", "uprhs_ms", "getdir_ms",
                         "search_ms"))
    return {k: round(v, 3) for k, v in res.items()}
