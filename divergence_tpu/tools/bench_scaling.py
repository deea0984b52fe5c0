"""Scaling-efficiency benchmark: the sharded divergence step over 1..N
devices (weak scaling — fixed windows per device).

North-star (BASELINE.json): >= 80% scaling efficiency from 1 chip to N.
On a multi-chip host this measures true ICI scaling; on a virtual CPU
mesh (xla_force_host_platform_device_count) it validates the harness and
the sharding itself (the window axis is embarrassingly parallel — the
only collectives are the chromosome-summary psum/pmax).
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_scaling_bench(
    max_devices: int | None = None,
    windows_per_device: int = 256,
    npos: int = 64,
    asize: int = 11,
    bsize: int = 10,
    nsamples: int = 25,
    mc_chunk: int = 128,
    repeats: int = 3,
) -> dict:
    import jax
    import jax.numpy as jnp

    from divergence_tpu.parallel import (
        make_divergence_step,
        make_mesh,
        window_sharding,
    )

    n_avail = len(jax.devices())
    max_devices = min(max_devices or n_avail, n_avail)
    sizes = []
    n = 1
    while n <= max_devices:
        sizes.append(n)
        n *= 2
    if sizes[-1] != max_devices:
        sizes.append(max_devices)

    rng = np.random.default_rng(0)
    results = []
    for nd in sizes:
        B = windows_per_device * nd
        codes = np.array([3.0, -3.0, 0.0, -10000.0])
        av = rng.choice(codes, size=(B, npos, asize), p=[0.45, 0.35, 0.15, 0.05])
        bv = rng.choice(codes, size=(B, npos, bsize), p=[0.45, 0.35, 0.15, 0.05])
        nposs = np.full(B, npos, dtype=np.int64)

        mesh = make_mesh(nd)
        step = make_divergence_step(
            mesh, asize, bsize, nsamples=nsamples, mc_chunk=mc_chunk
        )
        sh = window_sharding(mesh)
        args = (
            jax.device_put(jnp.asarray(av), sh),
            jax.device_put(jnp.asarray(bv), sh),
            jax.device_put(jnp.asarray(nposs), sh),
            jax.random.PRNGKey(0),
        )
        out = step(*args)                 # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = step(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / repeats
        results.append(
            {
                "devices": nd,
                "windows": B,
                "wall_s": round(dt, 4),
                "windows_per_s": round(B / dt, 1),
            }
        )

    base = results[0]
    for r in results:
        # weak scaling: efficiency = t(1) / t(N) at N-proportional work
        r["efficiency"] = round(base["wall_s"] / r["wall_s"], 3)
    return {
        "mode": "weak_scaling",
        "windows_per_device": windows_per_device,
        "backend": jax.default_backend(),
        "results": results,
    }


def main(args) -> None:
    report = run_scaling_bench(
        max_devices=args.devices,
        windows_per_device=args.windows_per_device,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--windows-per-device", type=int, default=256)
    main(ap.parse_args())
