"""Cheap chip speed probe: warm FET kernel on one 200k-SNP chromosome.

The axon tunnel has multi-hour slow modes (100-250x on CACHED binaries,
control plane unaffected — docs/ROUND4.md).  Run this before any timing
capture; expect ~0.12s/run in fast mode.  Exit 0 = fast, 1 = slow/down.

Run: python baseline/probe_tpu_speed.py [threshold_s]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import divergence_tpu  # noqa: F401
import jax

from bench import make_chromosome
from divergence_tpu.config import FetConfig
from divergence_tpu.engine import run_fet
from divergence_tpu.engine.snp import SnpPair

thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.6
positions, amat, bmat = make_chromosome(200_000, 10_000_000, 11, 10, 7)
pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
cfg = FetConfig(precision="fast")
run_fet(pair, 10_000_000, cfg)          # warm (compile-cached)
best = min(
    (lambda t0: (run_fet(pair, 10_000_000, cfg), time.perf_counter() - t0)[1])(
        time.perf_counter()
    )
    for _ in range(3)
)
mode = "FAST" if best <= thresh else "SLOW"
print(f"{mode}: best warm run_fet = {best:.3f}s "
      f"(fast-mode reference ~0.12s, threshold {thresh}s)")
sys.exit(0 if best <= thresh else 1)
