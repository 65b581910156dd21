"""Multi-host scaling-efficiency methodology (north-star metric:
"iterations/s scaling efficiency >=70% at 2+ hosts", BASELINE.json).

Real multi-host TPU hardware is not available in this environment, so
this script defines the measurement ON THE LOCAL CPU-MESH STAND-IN — the
same code path (jax.distributed + hybrid hosts x devices mesh + sharded
solve_batch) that a real pod launch runs, with processes standing in for
hosts.  The day hardware appears, run the identical recipe with
HYPATIA_MH_PLATFORM unset and one process per host (docs/multihost.md).

Weak scaling (the serving shape): per-host batch held fixed, so
  efficiency(N) = rate(N procs, N*B) / (N * rate(1 proc, B))
with rate = aggregate device iterations/s.

Run from repo root: python benchmarks/mh_efficiency_r4.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypatia_tpu.parallel.launch import launch


def measure(nprocs, nb, m=64, n=128, local_devices=2, timeout=1800,
            cores_per_host=2):
    """Each simulated host gets `cores_per_host` DEDICATED physical cores
    (taskset via launch(pin_cores=...)) in BOTH the 1- and N-process runs:
    without pinning, N processes on one machine time core contention, not
    scaling."""
    import subprocess

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "mh.json")
        args = ["--nb", str(nb), "--m", str(m), "--n", str(n),
                "--out", out, "--time-iters"]
        if nprocs == 1:
            # single "host": same dedicated core budget as each scaled host
            env = dict(os.environ)
            env.update({
                "HYPATIA_MH_NPROCS": "1", "HYPATIA_MH_PROC_ID": "0",
                "HYPATIA_MH_PLATFORM": "cpu",
                "HYPATIA_MH_LOCAL_DEVICES": str(local_devices),
                "JAX_PLATFORMS": "cpu",
            })
            subprocess.run(
                ["taskset", "-c", f"0-{cores_per_host - 1}",
                 sys.executable, "-m", "hypatia_tpu.parallel._mh_demo",
                 *args], env=env, check=True, timeout=timeout)
        else:
            launch(nprocs, "hypatia_tpu.parallel._mh_demo", args,
                   local_devices=local_devices, platform="cpu",
                   timeout=timeout, pin_cores=True)
        with open(out) as f:
            return json.load(f)


def main():
    per_proc_nb = int(os.environ.get("MH_NB", "8"))
    m = int(os.environ.get("MH_M", "32"))
    n = int(os.environ.get("MH_N", "64"))

    r1 = measure(1, per_proc_nb, m=m, n=n)
    r2 = measure(2, 2 * per_proc_nb, m=m, n=n)
    rate1 = r1["timing"]["agg_iters_per_s_device"]
    rate2 = r2["timing"]["agg_iters_per_s_device"]
    eff = rate2 / (2.0 * rate1)
    print(json.dumps({
        "metric": "multihost_weak_scaling_efficiency",
        "platform": "cpu-mesh stand-in (2 processes x 2 devices)",
        "per_process_batch": per_proc_nb,
        "instance": {"m": m, "n": n},
        "rate_1proc_iters_per_s": rate1,
        "rate_2proc_iters_per_s": rate2,
        "efficiency": round(eff, 3),
        "wall_efficiency": round(
            r2["timing"]["agg_iters_per_s_wall"]
            / (2.0 * r1["timing"]["agg_iters_per_s_wall"]), 3),
    }))


if __name__ == "__main__":
    main()
