"""2-process jax.distributed build on localhost CPU (VERDICT round-1
item 2: multi-host readiness) — the analog of the reference's
mpirun-multiple-ranks-on-one-host tests (SURVEY.md §4.3)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_build():
    port = _free_port()
    env = dict(os.environ)
    # workers must NOT inherit the test process's 8-virtual-device flag
    # (each contributes exactly one CPU device to the global mesh)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    worker = os.path.join(repo, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    combined = "".join(o for _, o, _ in outs)
    assert "MP_COUNTS:3,10,2,0" in combined, combined
    assert "MP_RESUME:ok" in combined, combined
