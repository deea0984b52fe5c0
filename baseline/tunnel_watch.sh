#!/bin/bash
# Watch for the axon TPU tunnel to come alive; on first success, run the
# one-shot capture battery (run_tpu_capture.sh) and exit.
#
# The relay is launcher-side: nothing in-container can start it, so all
# we can do is poll cheaply (a timed-out backend probe) and strike the
# moment jax.devices() answers.  Probe timeout is generous (180 s)
# because a live backend may still take ~minutes on first contact;
# polling interval is 420 s to avoid piling up killed TPU claims, which
# have been observed to wedge the remote end.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/baseline/tpu_capture"
mkdir -p "$OUT"
LOG="$OUT/watch.log"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

probe() {
    timeout -k 10 180 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('TPU alive:', d)
" >>"$LOG" 2>&1
}

echo "[watch] started $(date -u +%FT%TZ)" >>"$LOG"
while true; do
    if probe; then
        echo "[watch] tunnel UP $(date -u +%FT%TZ) — running capture battery" >>"$LOG"
        bash "$REPO/baseline/run_tpu_capture.sh" >>"$OUT/capture_run.log" 2>&1
        echo "[watch] capture battery finished rc=$? $(date -u +%FT%TZ)" >>"$LOG"
        exit 0
    fi
    echo "[watch] tunnel still down $(date -u +%FT%TZ)" >>"$LOG"
    sleep 420
done
