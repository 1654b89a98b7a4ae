"""Multi-host scale-out, tested for real (SURVEY §4.6): two OS processes
join one jax.distributed cluster on the CPU backend (gloo collectives),
build the global mesh, and pmean a gradient computed from process-local
data. This exercises multihost.initialize()'s explicit-argument path,
process/device topology, and an actual cross-process collective."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_two_process_pmean():
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    # every process must report the identical pmean'd gradient: with 4
    # devices holding 1..4, mean = 2.5
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, val = line.split()
                results[int(pid)] = float(val)
    assert sorted(results) == [0, 1], outs
    assert all(abs(v - 2.5) < 1e-6 for v in results.values()), results
