"""Probe whether the TPU (axon tunnel) can actually execute a program.

Device *enumeration* can succeed while execution hangs (wedged relay), so
the probe runs a real computation under a subprocess timeout.

Usage: python scripts/tpu_probe.py [--timeout 90]   -> exit 0 iff healthy
"""
from __future__ import annotations

import argparse
import subprocess
import sys

PROBE = (
    "import jax, jax.numpy as jnp;"
    "print(float(jnp.sqrt(jnp.ones((8, 8))).sum()))"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=90)
    args = ap.parse_args()
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], timeout=args.timeout,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print("TPU probe TIMEOUT (execution hangs)")
        return 1
    ok = out.returncode == 0 and "64.0" in out.stdout
    print("TPU probe", "OK" if ok else f"FAIL rc={out.returncode}")
    if not ok:
        sys.stderr.write(out.stderr[-500:])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
