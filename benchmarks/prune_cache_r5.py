"""Prune .jax_cache to the entries a driver bench run actually touches.

Policy (VERDICT r4 weak #8 / item 9): the committed cache exists ONLY to
make the driver's post-round `python bench.py` start warm; anything else
(profile scan probes, superseded program versions, one-off sweep
programs) is dead weight that grows without bound.  Keep set =
keys hit/written in a DEBUG-logged full bench run (parent process) plus
the CPU-baseline subprocess's keys; everything else is deleted.

Usage:
  JAX_DEBUG_LOG_MODULES=jax._src.compiler BENCH_BUDGET_S=100000 \
      BENCH_HARD_DEADLINE_S=100000 python -u bench.py \
      > benchmarks/bench_prune_probe.log 2>&1
  python benchmarks/prune_cache_r5.py benchmarks/bench_prune_probe.log \
      [extra_key_files...] [--apply]
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def keys_from_log(path):
    keys = set()
    for ln in open(path, errors="replace"):
        m = re.search(r"with key '([^']+)'", ln)
        if m:
            keys.add(m.group(1))
    return keys


def main():
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    keep = set()
    for path in args:
        ks = keys_from_log(path)
        print(f"{path}: {len(ks)} keys")
        keep |= ks
    kept_b = dropped_b = 0
    drops = []
    for f in sorted(os.listdir(CACHE)):
        key = f[:-6] if f.endswith("-cache") else f
        sz = os.path.getsize(os.path.join(CACHE, f))
        if key in keep:
            kept_b += sz
        else:
            dropped_b += sz
            drops.append(f)
    print(f"keep {len(keep)} keys / {kept_b/1e6:.0f} MB; "
          f"drop {len(drops)} files / {dropped_b/1e6:.0f} MB")
    if apply:
        for f in drops:
            os.remove(os.path.join(CACHE, f))
        print("pruned.")
    else:
        print("dry run (pass --apply to delete)")


if __name__ == "__main__":
    main()
