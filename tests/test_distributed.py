"""Multi-process (multi-host-style) smoke test of the distributed glue.

Two subprocesses, each with 4 virtual CPU devices, initialize
jax.distributed via sixdpose_tpu.parallel.distributed and run the
template+data sharded detection over the 8-device global mesh — the
CPU stand-in for a 2-host TPU run (SURVEY.md §4/§7).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_detect():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Strip the TPU-tunnel sitecustomize: it registers a backend at
    # interpreter start, which pins XLA flags before the worker sets them.
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "matched OK" in out, out[-2000:]
