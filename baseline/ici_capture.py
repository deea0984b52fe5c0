"""Turnkey real-ICI scaling capture (VERDICT r4 weak #5 / #8).

Point this at a host with N real TPU chips and it runs the weak+strong
scaling series, asserts the dispatch structure hasn't regressed, and
writes the BASELINE.json north-star field (>= 80% efficiency 1 -> N).
On a single-chip or CPU host it runs the SAME code on a virtual
8-device CPU mesh (harness validation; results marked "virtual" and the
north-star is NOT claimed).  Wrapper: baseline/run_ici_capture.sh.

Dispatch-structure assertions (so a dispatch regression cannot
masquerade as scaling loss):

* **no timed-loop compiles** — a `jax.monitoring` listener must see
  zero compile-cache events during the timed iterations (warmup owns
  every compile; a shape-instability regression recompiles per step);
* **host-sync counts** — `jax.device_get` is wrapped and counted: the
  scaling step must sync exactly once per timed iteration, and the
  engine smoke (a 2-chromosome genome through run_fet_multi +
  run_css_multi) must keep its one-packed-fetch structure (FET: exactly
  1 sync; CSS: 1 phase-1 sync + the adaptive MC's bounded chunk loop).
  Python-level device-PROGRAM counting is impossible on jax>=0.9 (the
  C++ jit fastpath never enters Python), but on remote/multi-host
  backends the host sync is the unit that costs wall time
  (docs/ROUND3.md: the round-3 MC spent 20x its compute in per-batch
  syncs) — this is the regression the assertion must catch.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@contextlib.contextmanager
def sync_counter():
    """Counts jax.device_get calls (the engines' host syncs)."""
    import jax

    box = {"n": 0}
    orig = jax.device_get

    def counting(*a, **k):
        box["n"] += 1
        return orig(*a, **k)

    jax.device_get = counting
    try:
        yield box
    finally:
        jax.device_get = orig


@contextlib.contextmanager
def compile_counter():
    from jax._src import monitoring

    box = {"n": 0}

    def listener(name, **kw):
        if "compil" in name:
            box["n"] += 1

    monitoring.register_event_listener(listener)
    try:
        yield box
    finally:
        monitoring.unregister_event_listener(listener)


def engine_dispatch_smoke() -> dict:
    """2-chromosome genome through both engine multis; returns the
    host-sync counts (structure, not speed)."""
    import numpy as np

    from divergence_tpu.config import CssConfig, FetConfig
    from divergence_tpu.engine.css_engine import run_css_multi
    from divergence_tpu.engine.fet_engine import run_fet_multi
    from divergence_tpu.engine.snp import SnpPair

    rng = np.random.default_rng(5)
    pairs = {}
    for c in range(2):
        pos = np.sort(
            rng.choice(np.arange(1, 200_000), size=4_000, replace=False)
        )
        vals = rng.choice(
            [3.0, -3.0, 0.0, -10000.0], size=(4_000, 21), p=[.4, .35, .2, .05]
        )
        pairs[f"chr{c}"] = (
            SnpPair(positions=pos, avals=vals[:, :11], bvals=vals[:, 11:]),
            200_000,
        )
    # warm (compiles happen here)
    run_fet_multi(pairs, FetConfig(precision="fast"))
    css_cfg = CssConfig(precision="fast", mc_runs=2_000, mc_chunk=512)
    run_css_multi(pairs, css_cfg)

    with sync_counter() as fet_syncs:
        run_fet_multi(pairs, FetConfig(precision="fast"))
    with sync_counter() as css_syncs:
        run_css_multi(pairs, css_cfg)
    mc_chunk_bound = -(-css_cfg.mc_runs // css_cfg.mc_chunk) + 4
    return {
        "fet_syncs": fet_syncs["n"],
        "css_syncs": css_syncs["n"],
        "css_sync_bound": mc_chunk_bound,
    }


def main() -> None:
    import time

    import jax

    from divergence_tpu.tools.bench_scaling import run_scaling_bench

    t0 = time.time()
    devices = jax.devices()
    real_tpu = devices[0].platform != "cpu"
    n = len(devices)
    virtual = not (real_tpu and n > 1)
    print(
        f"[ici] {n} x {devices[0].platform} device(s); "
        f"{'REAL multi-chip capture' if not virtual else 'virtual-mesh dry run'}",
        file=sys.stderr,
    )

    # 1) engine dispatch structure
    smoke = engine_dispatch_smoke()
    assert smoke["fet_syncs"] == 1, (
        "run_fet_multi must sync exactly once (one packed fetch); got "
        f"{smoke['fet_syncs']} — a per-batch host loop crept back in"
    )
    assert 1 <= smoke["css_syncs"] <= smoke["css_sync_bound"], smoke
    print(f"[ici] dispatch structure ok: {smoke}", file=sys.stderr)

    # 2) scaling series; every compile must land in warmup, never in a
    # timed region (a per-step recompile would masquerade as scaling
    # loss) — the guard wraps each timed loop via timed_ctx
    timed_compiles = {"n": 0}

    @contextlib.contextmanager
    def timed_guard():
        with compile_counter() as c:
            yield
        timed_compiles["n"] += c["n"]

    with compile_counter() as warm_compiles:
        report = run_scaling_bench(
            max_devices=n,
            windows_per_device=256,
            mc_chunk=128,
            repeats=3,
            timed_ctx=timed_guard,
        )
    assert timed_compiles["n"] == 0, (
        f"{timed_compiles['n']} compile events inside timed loops "
        "— per-step recompilation would masquerade as scaling loss"
    )

    weak_eff = report["weak_scaling"][-1]["efficiency"]
    strong_eff = report["strong_scaling"][-1]["efficiency"]
    out = {
        "virtual": virtual,
        "devices": n,
        "platform": devices[0].platform,
        "dispatch_smoke": smoke,
        "warmup_compile_events": warm_compiles["n"],
        "timed_compile_events": timed_compiles["n"],
        "weak_efficiency": weak_eff,
        "strong_efficiency": strong_eff,
        "north_star_met": (not virtual) and min(weak_eff, strong_eff) >= 0.8,
        "wall_s": round(time.time() - t0, 1),
        "report": report,
    }

    here = pathlib.Path(__file__).parent
    if virtual:
        path = here.parent / "docs" / "SCALING_virtual.json"
    else:
        path = here.parent / "docs" / "SCALING_ici.json"
        # record the north-star measurement in BASELINE.json
        bj = here.parent / "BASELINE.json"
        data = json.loads(bj.read_text())
        data.setdefault("measured", {})["ici_scaling_efficiency"] = {
            "devices": n,
            "weak": weak_eff,
            "strong": strong_eff,
            "target": 0.8,
            "met": out["north_star_met"],
        }
        bj.write_text(json.dumps(data, indent=2) + "\n")
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"[ici] wrote {path}", file=sys.stderr)
    print(json.dumps({k: v for k, v in out.items() if k != "report"}))


if __name__ == "__main__":
    main()
