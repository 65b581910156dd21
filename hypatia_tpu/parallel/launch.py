"""Local multi-process launcher for multi-host validation.

Spawns N copies of a Python module, each a separate JAX controller process
with its own CPU device set, wired to a 127.0.0.1 coordinator — the local
stand-in for an N-host pod launch (one controller per host, DCN between
them).  Usage:

    python -m hypatia_tpu.parallel.launch --nprocs 2 --local-devices 2 \
        -m hypatia_tpu.parallel._mh_demo -- --nb 8 --out /tmp/mh.json

On a real pod, skip this launcher: run one process per host with
HYPATIA_MH_COORD pointing at host 0 and HYPATIA_MH_PLATFORM unset (TPU),
then call ``multihost.initialize_from_env()`` first thing.
"""

import argparse
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(nprocs, module, module_args=(), local_devices=2,
           platform="cpu", timeout=600, pin_cores=False):
    """Spawn `nprocs` controller processes running `python -m module`.

    Returns the list of CompletedProcess results (raises on nonzero exit).

    ``pin_cores=True`` gives each process a DISJOINT physical core set
    (taskset): without it, N "hosts" on one machine contend for the same
    cores and a weak-scaling measurement reads contention, not scaling.
    Requires nprocs <= os.cpu_count(); cores are split evenly.
    """
    port = _free_port()
    cpu_count = os.cpu_count() or 1
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "HYPATIA_MH_COORD": f"127.0.0.1:{port}",
            "HYPATIA_MH_NPROCS": str(nprocs),
            "HYPATIA_MH_PROC_ID": str(pid),
            "HYPATIA_MH_PLATFORM": platform,
            "HYPATIA_MH_LOCAL_DEVICES": str(local_devices),
            "JAX_PLATFORMS": platform,
        })
        cmd = [sys.executable, "-m", module, *module_args]
        if pin_cores and nprocs <= cpu_count:
            per = cpu_count // nprocs
            lo, hi = pid * per, pid * per + per - 1
            cmd = ["taskset", "-c", f"{lo}-{hi}"] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    results = []
    failed = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failed.append((pid, "timeout", out, err))
            continue
        if p.returncode != 0:
            failed.append((pid, f"rc={p.returncode}", out, err))
        results.append((out, err))
    if failed:
        msgs = "\n".join(
            f"[proc {pid}] {why}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-2000:]}"
            for pid, why, out, err in failed)
        raise RuntimeError(f"multi-process launch failed:\n{msgs}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("-m", dest="module", required=True)
    ap.add_argument("module_args", nargs="*")
    args = ap.parse_args()
    results = launch(args.nprocs, args.module, args.module_args,
                     local_devices=args.local_devices,
                     platform=args.platform, timeout=args.timeout)
    for i, (out, err) in enumerate(results):
        if out.strip():
            print(f"--- proc {i} stdout ---\n{out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
