"""Per-cone-oracle latency pass for the eigh-based matrix cones.

The IPM's per-iteration cost on matrix-cone models is dominated by the
cone oracles (eigh + divided-difference kernels), not the KKT solve —
this driver times the three oracles the stepper calls per iteration
(point_aux, inv_hess_prod via the aux, dder3) for each eigh-based cone
family at a few sizes, on whatever backend is active. Reference analog:
the per-cone timing loops in `/root/reference/test/cone.jl:117-150`
measure oracle correctness; no upstream latency table exists — this is
the TPU-side speed-of-light accounting (which oracle to pallas-ify
next).

Run from repo root (one long-lived process, remote-compile friendly):
    python -u benchmarks/cone_latency_r5.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    # script-mode only: the session env pins JAX_PLATFORMS=axon, so doing
    # this at import time would move an importing caller's run onto the
    # single-client TPU (see manycone_r4.py round-5 incident note)
    _p = os.environ.get("JAX_PLATFORMS")
    if _p:
        jax.config.update("jax_platforms", _p.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hypatia_tpu import cones

REPS = 20


def time_fn(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e3, out


def bench_cone(name, cone, s0=None):
    s = jnp.asarray(cone.init_point() if s0 is None else s0)
    d = jnp.asarray(np.random.default_rng(0).standard_normal(s.shape)
                    * 0.01) + s * 0.0
    aux_fn = jax.jit(cone.point_aux)
    ihp_fn = jax.jit(lambda s_, d_, aux: cone.inv_hess_prod(s_, d_, aux=aux))
    dd_fn = jax.jit(lambda s_, d_, aux: cone.dder3(s_, d_, aux=aux))
    row = {}
    t, aux = time_fn(aux_fn, s)
    row["point_aux_ms"] = round(t, 3)
    t, _ = time_fn(ihp_fn, s, d, aux)
    row["inv_hess_prod_ms"] = round(t, 3)
    t, _ = time_fn(dd_fn, s, d, aux)
    row["dder3_ms"] = round(t, 3)
    print(f"[{name}] {json.dumps(row)}", flush=True)
    return row


def main():
    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    out = {"backend": jax.default_backend()}
    jobs = []
    for side in (30, 100, 200):
        sd = side * (side + 1) // 2
        jobs.append((f"possemideftri_{side}",
                     cones.PosSemidefTri(sd)))
    for side in (10, 30):
        jobs.append((f"sepspectral_mat_neglog_{side}",
                     cones.EpiPerSepSpectralMatrix(cones.NegLogSSF(),
                                                   side)))
    for side in (6, 12):
        sd = side * (side + 1) // 2
        jobs.append((f"epitrrelentropy_{side}",
                     cones.EpiTrRelEntropyTri(2 * sd + 1)))
    for name, cone in jobs:
        try:
            out[name] = bench_cone(name, cone)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"[{name}] ERROR {e}", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
