"""Real multi-process validation: 2 jax.distributed processes, each with 4
virtual CPU devices, running the SHARDED Trainer end-to-end over a global
8-device mesh.

This is the TPU-native analog of the reference's `mpirun -n 2` one-box
topology tests (SURVEY.md §4.5; MPI init ExecutionInfo.cpp:33-75, gradient
Iallreduce Optimizer.cpp:110-119): process boundaries are real (separate
interpreters + a coordinator), gradients psum across them over the
"learners" axis, and both processes must end with identical replicated
parameters.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_trainer():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the conftest of THIS process forces 8 devices; workers get their own
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} failed:\n{out[-3000:]}"
    # both processes converged to the SAME replicated parameters and see
    # the same global replay counters
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, ck, n = line.split()
                results[int(pid)] = (ck, int(n))
    assert set(results) == {0, 1}, f"missing results: {outs}"
    assert results[0] == results[1], \
        f"process-divergent state: {results}"
