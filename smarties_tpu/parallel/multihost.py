"""Multi-host (DCN) initialization helpers.

The reference scales past one node with MPI ranks (ExecutionInfo MPI_Init +
topology solver); the TPU-native equivalent is jax.distributed: every host
runs the same program, jax.devices() becomes the GLOBAL device list, and
the same "learners" mesh axis (parallel/mesh.py) spans hosts — gradient
psums ride ICI within a slice and DCN across slices, inserted by GSPMD.

Single-chip environments (like this development pod) cannot exercise the
multi-host path; tests emulate it with
XLA_FLAGS=--xla_force_host_platform_device_count=N (SURVEY.md section 4).

Usage on a real multi-host slice:

    from smarties_tpu.parallel.multihost import init_multihost
    init_multihost()              # reads the TPU cluster env (GKE/GCE)
    mesh = make_mesh()            # global mesh over all hosts' devices
    tr = Trainer(..., mesh=mesh, n_envs=per_host_envs * n_hosts, ...)

Each host steps ONLY its own env lanes (shard_map places each shard's
rollout on its local devices); the Trainer host loop runs identically on
every host (same RNG seeds => same pacing decisions; the only host-varying
data, episode logs, is written per-host).
"""
from __future__ import annotations

import jax


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """jax.distributed.initialize with optional explicit topology
    (auto-detected on Cloud TPU). Call before any other jax API."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
