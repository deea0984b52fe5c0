#!/bin/bash
# One-shot TPU measurement battery — run when the tunnel is up.
# Produces: bench JSON line, MC-backend A/B, scaling JSON, demo timings.
# Results land in baseline/tpu_capture/.
set -uo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/baseline/tpu_capture"
mkdir -p "$OUT"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

# RUNNING marker: bench.py waits on this so the driver's capture and
# this battery never claim the remote chip concurrently (observed to
# wedge the tunnel).  Refreshed per step; removed on exit.
touch "$OUT/RUNNING"
trap 'rm -f "$OUT/RUNNING"' EXIT
# tells bench.py the marker is OURS (its wait-for-battery must not
# deadlock on the battery's own bench step)
export CAPTURE_BATTERY=1

echo "== doctor =="
timeout 300 python -m divergence_tpu.tools.cli doctor --timeout 240 \
    | tee "$OUT/doctor.json"

touch "$OUT/RUNNING"
echo "== bench.py (headline) =="
BENCH_PROBE_ATTEMPTS=1 timeout 3600 python "$REPO/bench.py" \
    2> "$OUT/bench.stderr" | tee "$OUT/bench.json"
tail -5 "$OUT/bench.stderr"

touch "$OUT/RUNNING"
echo "== bench-mc: in-loop (production) + standalone A/B =="
timeout 3600 python -m divergence_tpu.tools.cli bench-mc \
    --window-batch 1024 --chunk 256 --iters 8 \
    --backends inloop,inloop_threefry,inloop_matmul,inloop_pallas \
    | tee "$OUT/bench_mc_inloop.json"
timeout 3600 python -m divergence_tpu.tools.cli bench-mc \
    --window-batch 1024 --chunk 256 --iters 4 \
    --backends xla,xla_threefry,xla_matmul,xla_mlast,pallas,native \
    | tee "$OUT/bench_mc.json"

touch "$OUT/RUNNING"
echo "== FET precision=exact =="
timeout 3600 python - <<'EOF' | tee "$OUT/fet_exact.json"
import json, sys, time
sys.path.insert(0, "/root/repo")
from bench import make_chromosome
import divergence_tpu
from divergence_tpu.config import FetConfig
from divergence_tpu.core.windows import plan_windows
from divergence_tpu.engine import run_fet
from divergence_tpu.engine.snp import SnpPair

cfg = FetConfig(precision="exact")
positions, amat, bmat = make_chromosome(200_000, 10_000_000, 11, 10, 7)
pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
plan = plan_windows(positions, 10_000_000, 2500, 500)
n_tests = int(plan.npos[plan.valid_mask()].sum())
run_fet(pair, 10_000_000, cfg)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    run_fet(pair, 10_000_000, cfg)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"fet_exact_tests_per_s": round(n_tests / best, 1),
                  "wall_s": round(best, 3)}))
EOF

touch "$OUT/RUNNING"
echo "== genome demo (5 chrom x 200k SNPs, fast) =="
rm -rf /tmp/tpu_demo
timeout 7200 python "$REPO/examples/genome_demo.py" /tmp/tpu_demo --approx \
    2>&1 | tail -12 | tee "$OUT/genome_demo.txt"

echo "== capture complete: $OUT =="
