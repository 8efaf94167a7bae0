"""Real multi-process jax.distributed test (2 processes x 4 CPU devices).

The reference has no multi-host story (SURVEY.md §5: ROS topics in one
host + robot UDP); the distributed backend is this framework's new axis.
This test proves it END-TO-END, not just on a single-process virtual
mesh: explicit-coordinator jax.distributed.initialize, gloo cross-
process collectives, the (hosts x chips) mesh, a GSPMD-partitioned MPC
control tick whose scenario batch spans both processes, and a cross-
process metric reduction that must agree bit-for-bit on both ranks.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_tick():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the workers call jax.config.update('jax_platforms','cpu')
    # themselves (sitecustomize overrides the env var)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK" in out, out[-3000:]
        assert "processes=2 local_devices=4 global_devices=8" in out, \
            out[-3000:]
    # the cross-process-reduced metrics (XLA route, the round-4
    # pallas_shared/reduced_admm route, AND the round-5 amortized
    # route) must be identical on both ranks
    for out in outs:
        assert "production-route mean|tau|=" in out, out[-3000:]
        assert "amortized-route mean|tau|=" in out, out[-3000:]
    vals = [out.split("MULTIHOST_OK")[1].split()[:3] for out in outs]
    assert vals[0] == vals[1], vals
