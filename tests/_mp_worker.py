"""Subprocess worker for the 2-process jax.distributed test
(tests/test_multiprocess.py). Runs the sharded Trainer end-to-end on a
GLOBAL mesh spanning both processes' virtual CPU devices — the analog of
the reference's `mpirun -n 2 ./exec` one-box validation (SURVEY.md §4.5).
"""
import os
import sys

# env set by the parent: JAX_PLATFORMS=cpu, xla_force_host_platform_device_count
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from smarties_tpu.parallel.multihost import init_multihost
    init_multihost(coord, n_proc, pid)

    import jax
    assert jax.process_count() == n_proc
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"proc {pid}: {n_local} local / {n_global} global devices",
          flush=True)
    assert n_global == n_proc * n_local

    from smarties_tpu.envs import cartpole
    from smarties_tpu.parallel.mesh import make_mesh
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters

    mesh = make_mesh()   # global mesh over all 8 devices
    cfg = HyperParameters(minTotObsNum=512, maxTotObsNum=4096,
                          batchSize=64, nnLayerSizes=[16, 16],
                          obsPerStep=1.0)
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=32, n_slots=64,
                 max_len=cartpole.MAX_STEPS, mesh=mesh)
    tr.train(200, log_every=10**9)
    assert tr.n_grad_steps >= 200

    # replicated parameters must be bitwise identical across processes
    leaves = jax.tree_util.tree_leaves(tr.params)
    flat = np.concatenate([np.asarray(x).ravel() for x in leaves])
    assert np.isfinite(flat).all(), "non-finite params after training"
    # global replay counters agree across processes
    n_stored = int(tr.replay.n_stored_steps())
    print(f"RESULT {pid} {flat[:64].sum():.10e} {n_stored}", flush=True)


if __name__ == "__main__":
    main()
