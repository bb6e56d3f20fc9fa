"""Real 2-process jax.distributed exercise of parallel/multihost.py: two
OS processes (2 virtual CPU devices each) rendezvous through a coordinator,
assemble a global sharded coefficient vector no single process fully holds,
and run the four-step sharded coset LDE across all 4 devices — value-checked
per shard against the single-device LDE. (The reference has no multi-host
story at all; this guards the claim that ours is real, not single-process
degradation.)"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_coset_lde_two_processes():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "multihost coset_lde_large OK" in out, out[-2000:]
