#!/usr/bin/env bash
# Turnkey real-ICI scaling capture (VERDICT r4 #8).
#
# On a host with N real TPU chips:   ./baseline/run_ici_capture.sh
#   -> runs weak+strong scaling over 1..N chips over ICI, asserts the
#      dispatch structure, writes docs/SCALING_ici.json and the
#      BASELINE.json north-star field (>= 80% efficiency).
#
# On this dev box (single tunneled chip, no ICI):
#   VIRTUAL=1 ./baseline/run_ici_capture.sh
#   -> same code on a virtual 8-device CPU mesh (harness validation
#      only; writes docs/SCALING_virtual.json, north-star NOT claimed).
#
# Multi-HOST (DCN) runs: launch this script once per host with
# JAX_COORDINATOR_ADDRESS / process env set per jax.distributed docs;
# ici_capture.py itself only needs jax.devices() to see every chip.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${VIRTUAL:-0}" == "1" ]]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
fi

# never clobber PYTHONPATH (axon plugin lives in a site dir)
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
exec python baseline/ici_capture.py
