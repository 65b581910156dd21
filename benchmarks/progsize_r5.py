"""Traced-program size census (round 5, VERDICT item 2).

Lowers each bench config's fused solve program on CPU (tracing only, no
execution) and reports StableHLO text size plus an op histogram — the
data for shrinking the O(d^2) program blowups (relentr 100+ MB compiled
binaries, nearestpsd side=100 9.7 MB MLIR that OOM-killed the compile
helper)."""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import examples  # noqa: E402
from hypatia_tpu import Solver  # noqa: E402
from hypatia_tpu.solvers import fused  # noqa: E402

captured = {}
_orig = fused.fused_solve_jit


def _capture(ctx, data, conv_tols, tols, pt, iter_limit, tol_slow):
    captured["args"] = (ctx, data, conv_tols, tols, pt, iter_limit,
                        tol_slow)
    raise _Captured


class _Captured(Exception):
    pass


fused.fused_solve_jit = _capture

CONFIGS = [
    ("linearopt_1k", examples.linearopt, dict(m=1000, n=2000)),
    ("portfolio", examples.portfolio, dict(num_stocks=100)),
    ("polymin", examples.polymin, dict(poly="univariate_quartic")),
    ("relentr_2", examples.relentrentanglement, dict(na=2, nb=2)),
    ("doptimaldesign", examples.doptimaldesign,
     dict(q=10, p=30, n=60, n_max=6, use_logdet=True)),
    ("nearestpsd_30", examples.nearestpsd, dict(side=30)),
    ("nearestpsd_60", examples.nearestpsd, dict(side=60)),
    ("nearestpsd_100", examples.nearestpsd, dict(side=100)),
]


def main():
    names = sys.argv[1:] or [n for n, _, _ in CONFIGS]
    for name, mod, params in CONFIGS:
        if name not in names:
            continue
        model = mod.build(**params)
        s = Solver(verbose=False, fused=True, iter_limit=200,
                   default_tol_relax=10)
        s.load(model)
        try:
            s.solve()
        except _Captured:
            pass
        args = captured["args"]
        lowered = _orig.lower(*args)
        txt = lowered.as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"= \"?([\w.]+)\"?\(", txt))
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
        print(f"{name}: hlo_text={len(txt)/1e6:.2f} MB "
              f"lines={txt.count(chr(10))} | {top}", flush=True)


if __name__ == "__main__":
    main()
