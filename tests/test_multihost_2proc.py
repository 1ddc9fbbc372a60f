"""Two-process multihost smoke test.

Spawns 2 real OS processes that form a jax.distributed cluster over a
local coordinator (CPU backend, 2 virtual devices each = 4 global), and
run ``parallel/multihost.py`` end-to-end — the multi-process path that a
single-process pytest run can never reach (reference delegated all of
this to torch.distributed launchers, SURVEY.md §2.2/§5.8).
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster():
    port = _free_port()
    env = dict(os.environ)
    # the worker self-configures the CPU platform via jax.config; make sure
    # no leaked coordinator vars interfere
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        env.pop(var, None)
    repo_root = os.path.dirname(HERE)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH"), repo_root]))
    worker = os.path.join(HERE, "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
    # both processes computed the same global sum through the collective
    sums = {line.split("sum=")[1].split()[0]
            for out in outs for line in out.splitlines()
            if "WORKER_OK" in line}
    assert len(sums) == 1, sums
