"""Decompose warm genome run-fet into its fixed tunnel costs (VERDICT r3 #6).

Measures, solo on the chip (concurrent users of the single tunneled
device inflate everything 25-50x — docs/ROUND4.md):

- backend init (first device interaction of the process)
- scalar round-trip time (median of 10 tiny device_gets)
- genotype upload (5 chromosomes' joint int16 arrays, blocked)
- trace+compile-cache-load (first run_fet_multi minus steady state)
- steady-state execute+fetch (second run_fet_multi on cached uploads)

The sum of the per-process constants (init + trace) plus the per-genome
work (upload + exec/fetch) is the measured floor for the 5x200k-SNP
genome; BASELINE.md cites the resulting budget.

Run: python baseline/exp_fet_floor.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import divergence_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from bench import make_chromosome
from divergence_tpu.config import FetConfig
from divergence_tpu.engine.fet_engine import run_fet_multi
from divergence_tpu.engine.snp import SnpPair


def main():
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(1))
    t_init = time.perf_counter() - t0
    print(f"backend init: {t_init:.2f}s  ({jax.devices()[0]})")

    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(jnp.zeros(1) + 1.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"scalar RTT: median {rtt * 1e3:.0f}ms "
          f"(min {min(rtts) * 1e3:.0f}, max {max(rtts) * 1e3:.0f})")

    pairs = {}
    for c in range(5):
        p, a, b = make_chromosome(200_000, 10_000_000, 11, 10, 100 + c)
        pairs[f"chr{c + 1}"] = (SnpPair(positions=p, avals=a, bvals=b),
                                10_000_000)

    t0 = time.perf_counter()
    ups = [pr.device_values_joint(compact=True) for pr, _ in pairs.values()]
    jax.block_until_ready(ups)
    t_up = time.perf_counter() - t0
    nbytes = sum(u.nbytes for u in ups)
    print(f"upload: {t_up:.2f}s for {nbytes / 1e6:.0f} MB "
          f"({nbytes / t_up / 1e6:.0f} MB/s)")

    cfg = FetConfig(precision="fast")
    t0 = time.perf_counter()
    run_fet_multi(pairs, cfg)
    t_first = time.perf_counter() - t0
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_fet_multi(pairs, cfg)
        runs.append(time.perf_counter() - t0)
    t_steady = float(np.median(runs))
    print(f"run_fet_multi first (trace + cache-load + exec): {t_first:.2f}s")
    print(f"run_fet_multi steady (exec + fetch): {t_steady:.2f}s "
          f"(runs: {[round(r, 2) for r in runs]})")
    print(
        f"\nbudget: init {t_init:.1f}s + trace/load "
        f"{t_first - t_steady:.1f}s + upload {t_up:.1f}s + exec/fetch "
        f"{t_steady:.1f}s = "
        f"{t_init + t_first + t_up:.1f}s warm-process genome floor "
        f"(per-genome marginal: upload + exec/fetch = "
        f"{t_up + t_steady:.1f}s)"
    )


if __name__ == "__main__":
    main()
