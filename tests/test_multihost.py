"""Multi-process smoke tests (VERDICT r2 item 5; docs/MULTIHOST.md).

Spawns REAL OS processes with `jax.distributed.initialize` over the
gloo CPU backend and runs the sharded pipeline end to end — the
closest this single-chip build environment can get to a multi-host
slice. Kept to one small e2e case: ~60-90 s of subprocess compile
time on the shared 4-core host.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("mode,gate,walk_engine", [
    ("dp", 0.9, "default"),
    ("rowshard", 0.7, "default"),
    # the round-4 exact-exchange engine: its tiled all_to_all (and
    # piggybacked termination count) runs over REAL cross-process
    # gloo collectives here, not just the virtual single-process mesh
    ("dp", 0.9, "a2a"),
])
def test_two_process_deepwalk_end_to_end(tmp_path, mode, gate,
                                         walk_engine):
    """2 processes x 2 virtual CPU devices: distributed walks + sharded
    training through the reference API; rank 0's micro-F1 must clear
    the mode's gate (dp saturates the community test at this config;
    exact rowshard scores 0.79-0.83 single-process — same cross-process,
    which is the point: put_global sharded tables + process_allgather
    preserve the exact semantics)."""
    port = _free_port()
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(__file__))
    pythonpath = os.pathsep.join(
        p for p in (os.environ.get("PYTHONPATH", ""), repo_root) if p
    )
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=pythonpath,
    )
    script = os.path.join(
        os.path.dirname(os.path.dirname(__file__)),
        "examples", "deepwalk_multihost.py",
    )
    procs = []
    logs = []
    for pid in range(2):
        log = open(tmp_path / f"p{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, script,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--nodes", "120", "--iter", "3", "--json",
             "--mode", mode, "--walk-engine", walk_engine],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            cwd=str(tmp_path),
        ))
    rcs = [p.wait(timeout=560) for p in procs]
    for log in logs:
        log.close()
    out0 = (tmp_path / "p0.log").read_text()
    assert rcs == [0, 0], out0[-2000:]
    line = [l for l in out0.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["processes"] == 2, res
    assert res["walk_overflow"] == 0, res
    assert res["micro_f1"] >= gate, res
