"""Environment diagnostics: backend reachability, devices, caches.

Remote-TPU deployments fail in characteristic ways (tunnel down ->
backend init blocks forever; stale compilation cache; missing native
parser toolchain).  ``divergence-tpu doctor`` probes each layer with
timeouts and prints one JSON report — run it before filing a perf or
hang report.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _probe_devices(timeout_s: int) -> dict:
    """Backend init in a subprocess (a wedged remote tunnel blocks the
    calling process indefinitely; a thread cannot be killed)."""
    code = (
        "import divergence_tpu, jax, json; "
        "ds = jax.devices(); "
        "print(json.dumps({'platform': ds[0].platform, 'n': len(ds), "
        "'kind': getattr(ds[0], 'device_kind', '?')}))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        if r.returncode == 0 and r.stdout.strip():
            # warnings/plugin chatter can interleave with the JSON line;
            # a diagnosis tool must report the garbage, not crash on it
            try:
                out = json.loads(r.stdout.strip().splitlines()[-1])
            except json.JSONDecodeError:
                return {
                    "ok": False,
                    "error": "probe emitted non-JSON stdout: "
                    + r.stdout.strip()[-300:],
                }
            out["ok"] = True
            return out
        return {
            "ok": False,
            "error": (r.stderr or "no output")[-400:],
        }
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": f"backend init exceeded {timeout_s}s "
            "(remote tunnel down or wedged?)",
        }


def run_doctor(timeout_s: int = 60) -> dict:
    report: dict = {
        "python": sys.version.split()[0],
        "JAX_PLATFORMS": os.environ.get("JAX_PLATFORMS"),
        "XLA_FLAGS": os.environ.get("XLA_FLAGS"),
    }

    import jax

    report["jax"] = jax.__version__

    report["default_backend_probe"] = _probe_devices(timeout_s)

    cache = os.environ.get(
        "DIVERGENCE_TPU_CACHE",
        os.path.expanduser("~/.cache/divergence_tpu/xla"),
    )
    try:
        n = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        report["compile_cache"] = {"dir": cache, "entries": n}
    except OSError as e:
        report["compile_cache"] = {"dir": cache, "error": str(e)}

    try:
        from divergence_tpu.native import native_available

        report["native_parser"] = bool(native_available())
    except Exception as e:
        report["native_parser"] = f"error: {e}"

    # tiny CPU-forced compute check (config route, immune to the tunnel)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import jax.numpy as jnp; "
        "print(float(jax.device_get(jnp.sum(jnp.ones((8, 8)) @ "
        "jnp.ones((8, 8))))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        report["cpu_compute"] = (
            "ok" if r.returncode == 0 and "512" in r.stdout else "failed"
        )
    except subprocess.TimeoutExpired:
        report["cpu_compute"] = "timeout"

    return report


def main(args) -> None:
    print(json.dumps(run_doctor(timeout_s=args.timeout), indent=2))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=60)
    main(ap.parse_args())
