"""Micro: cost of ONE vmapped batched IPM body on TPU, decomposed.

The fused batched while_loop measured 0.5 agg it/s (34 s per loop trip at
nb=32!?) — this isolates whether the batched BODY itself is slow (vmap
pathology) or the while program is (runtime pathology), and which phase.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import examples
from hypatia_tpu.ops import linalg as _linalg
from hypatia_tpu.parallel import batch as pbatch
from hypatia_tpu.solvers import fused, syssolvers
from hypatia_tpu.solvers.structures import StepContext, compute_iter_aux
from hypatia_tpu.solvers.solver import Solver, calc_convergence


def build(nb=32, m=64, n=128):
    models = [examples.linearopt.build(m=m, n=n, seed=s) for s in range(nb)]
    # reuse solve_batch's data staging by calling its internals via a tiny
    # copy: build ctx + stacked data exactly as solve_batch does
    import scipy.linalg
    m0 = models[0]
    from hypatia_tpu.cones.batched import group_cones
    g_cones, g_idxs = group_cones(tuple(m0.cones), tuple(m0.cone_idxs))
    ref = Solver(syssolver="symindef", preprocess=False, reduce=False,
                 rescale=False)
    ctx = StepContext(cones=g_cones, cone_idxs=g_idxs, n=m0.n, p=m0.p,
                      q=m0.q, nu=m0.nu, dtype=jnp.dtype(np.float64),
                      syssolver="qrchol", stepper=ref.stepper,
                      max_ref_steps=ref.max_ref_steps, **ref.stepper_opts)
    data = {k: np.stack([np.asarray(getattr(mm, k)) for mm in models])
            for k in ("c", "A", "b", "G", "h")}
    Qs, Rs, GQ1s, GQ2s, Rinv = [], [], [], [], []
    for mm in models:
        Q, R = scipy.linalg.qr(mm.A.T, mode="full")
        GQ = mm.G @ Q
        Qs.append(Q); Rs.append(R[:m0.p, :m0.p])
        Rinv.append(scipy.linalg.solve_triangular(
            R[:m0.p, :m0.p], np.eye(m0.p), lower=False))
        GQ1s.append(GQ[:, :m0.p]); GQ2s.append(GQ[:, m0.p:])
    data.update(Ap_Q=np.stack(Qs), Ap_R=np.stack(Rs),
                Ap_Rinv=np.stack(Rinv), GQ1=np.stack(GQ1s),
                GQ2=np.stack(GQ2s))
    data = {k: jnp.asarray(v) for k, v in data.items()}

    init_z = np.zeros((nb, m0.q)); init_s = np.zeros((nb, m0.q))
    for cone, (start, dim) in zip(m0.cones, m0.cone_idxs):
        pt0 = np.asarray(cone.init_point())
        g0 = np.asarray(cone.grad(jnp.asarray(pt0)))
        init_s[:, start:start+dim] = pt0
        init_z[:, start:start+dim] = -g0
    init_x = np.zeros((nb, m0.n)); init_y = np.zeros((nb, m0.p))
    for i, mm in enumerate(models):
        AG = np.vstack([mm.A, mm.G])
        rhs = np.concatenate([mm.b, mm.h - init_s[i]])
        init_x[i], *_ = np.linalg.lstsq(AG, rhs, rcond=None)
        rhs_y = -mm.c - mm.G.T @ init_z[i]
        init_y[i], *_ = np.linalg.lstsq(mm.A.T, rhs_y, rcond=None)
    pt = {"x": jnp.asarray(init_x), "y": jnp.asarray(init_y),
          "z": jnp.asarray(init_z), "s": jnp.asarray(init_s),
          "tau": jnp.ones(nb), "kap": jnp.ones(nb)}
    conv_tols = {"x": 1.0, "y": 1.0, "z": 1.0}
    tols = {k: jnp.asarray(v) for k, v in dict(
        tol_feas=1e-7, tol_rel_opt=1e-7, tol_abs_opt=1e-11,
        tol_infeas=1e-11, tol_illposed=1e-12).items()}
    return ctx, data, pt, conv_tols, tols


def timeit(f, args, label, reps=3):
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    print(f"{label}: exec={min(ts)*1e3:.1f} ms (compile {compile_s:.0f}s)",
          flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    nb = int(os.environ.get("NB", "32"))
    ctx, data, pt, conv_tols, tols = build(nb=nb)

    with _linalg.chol_tries(2), _linalg.blocked_scope():
        body_fn = fused.make_body(ctx, conv_tols, tols)
        batched_body = jax.vmap(body_fn, in_axes=(0, 0))
        carry0 = jax.vmap(lambda p: fused.init_carry(ctx, p))(pt)

        @jax.jit
        def one_body(data, carry):
            return batched_body(data, carry)

        # phase pieces
        b_iter_aux = jax.vmap(lambda p: compute_iter_aux(ctx, p))
        one_aux = jax.jit(lambda pt: b_iter_aux(pt))
        b_upd = jax.vmap(lambda d, ia: syssolvers.update_lhs(ctx, d, ia))
        one_upd = jax.jit(lambda d, ia: b_upd(d, ia))

    timeit(one_aux, (pt,), "iter_aux (vmapped)")
    ia = one_aux(pt)
    timeit(one_upd, (data, ia), "update_lhs (vmapped)")
    carry1 = timeit(one_body, (data, carry0), "full body (vmapped)")


if __name__ == "__main__" and not os.environ.get("LOOPS"):
    main()


def loops():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr,
          flush=True)
    nb = int(os.environ.get("NB", "32"))
    ctx, data, pt, conv_tols, tols = build(nb=nb)
    with _linalg.chol_tries(2), _linalg.blocked_scope():
        body_fn = fused.make_body(ctx, conv_tols, tols)
        batched_body = jax.vmap(body_fn, in_axes=(0, 0))
        carry0 = jax.vmap(lambda p: fused.init_carry(ctx, p))(pt)

        @jax.jit
        def scan16(data, carry):
            def sbody(c, _):
                return batched_body(data, c), None
            return jax.lax.scan(sbody, carry, None, length=16)[0]

        @jax.jit
        def while8(data, carry):
            def cond(c):
                return jnp.any((c["status"] == 0) & (c["it"] < 8))
            def wbody(c):
                return batched_body(data, c)
            return jax.lax.while_loop(cond, wbody, carry)

    c1 = timeit(scan16, (data, carry0), "scan-of-16 bodies")
    c2 = timeit(while8, (data, carry0), "while_loop (8 iters)")
    print("scan iters:", np.asarray(c1["it"]).min(), "-",
          np.asarray(c1["it"]).max(), " while iters:",
          np.asarray(c2["it"]).max(), flush=True)


if __name__ == "__main__" and os.environ.get("LOOPS"):
    loops()
