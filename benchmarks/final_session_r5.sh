#!/bin/bash
# Round-5 final TPU session: prime the driver bench (incl. the new hetero
# row's compiles), then the remaining sweep stages in value order.
# One client at a time; never killed mid-compile.
cd /root/repo
echo "=== bench prime4 $(date -u) ==="
BENCH_BUDGET_S=100000 BENCH_HARD_DEADLINE_S=100000 python -u bench.py \
    2>&1 | tee benchmarks/bench_r5_prime4.log | grep -E "\[bench\]|^\{"
cp -f BENCH_LOCAL.json BENCH_LOCAL.json.bak 2>/dev/null
grep -E '^\{"metric"' benchmarks/bench_r5_prime4.log | tail -1 > BENCH_LOCAL.json
echo "=== sweep stages $(date -u) ==="
python -u benchmarks/tpu_sweep_r5.py nearestpsd manycone2 gp9 dprofile \
    ddoff_polymin bgetdir conelat \
    > benchmarks/sweep_r5c_log.txt 2>&1
echo "=== done $(date -u) ==="
