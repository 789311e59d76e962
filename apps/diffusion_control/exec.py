#!/usr/bin/env python3
"""Domain-decomposed PDE-control demo: the CUP2D-coupling pattern.

The reference's flagship use case couples smarties to CubismUP CFD
solvers partitioned over MPI ranks (reference apps/CUP2D_*): each rank
advances its sub-domain, ranks exchange halo data over the app-side
communicator, and ONE logical agent controls the whole simulation
(Communicator::envHasDistributedAgents + the action MPI_Bcast,
Core/Worker.cpp:371-383). No CFD solver ships in this image, so this
app reproduces the exact same coupling shape on a 1-D heat equation:

  u_t = kappa * u_xx + sum_k a_k * phi_k(x)        on [0, 1]

- the rod's N cells are SPLIT ACROSS THE ENV TEAM (domain
  decomposition); each rank integrates its slice with explicit Euler
  and exchanges boundary (halo) cells with its neighbors through the
  TeamComm (environment_app_comm analog, runtime/team.py);
- the agent observes coarse temperature sensors over the full rod
  (allgathered) and sets the amplitudes of K actuators to drive the
  profile to a uniform target; reward = -MSE(u, target);
- every rank sends the identical assembled state; only rank 0's is
  ingested; all ranks receive the same action reply.

Run (3-process team per env):

    python apps/diffusion_control/exec.py --nEnvironments 2

or single-process (no team) with --workers 1.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

N = 64            # rod cells (global)
SENSORS = 16      # coarse observations
K_ACT = 4         # actuator count
KAPPA = 0.25
DT = 0.2          # stable: dt <= dx^2 / (2 kappa) with dx=1/N scaled units
EP_LEN = 100
TARGET = 0.5


def actuator_profiles():
    """K Gaussian actuator footprints over the rod."""
    x = (np.arange(N) + 0.5) / N
    centers = (np.arange(K_ACT) + 0.5) / K_ACT
    return np.exp(-0.5 * ((x[None, :] - centers[:, None]) / 0.08) ** 2)


PHI = actuator_profiles()


def app_main(comm, team=None):
    rank = team.rank if team is not None else 0
    size = team.size if team is not None else 1
    assert N % size == 0
    n_loc = N // size
    lo = rank * n_loc

    comm.setStateActionDims(SENSORS + 1, K_ACT)
    comm.setActionScales([1.0] * K_ACT, [-1.0] * K_ACT, True)
    comm.setStateScales([1.0] * SENSORS + [1.0],
                        [0.0] * SENSORS + [0.0])
    if size > 1:
        comm.envHasDistributedAgents()

    rng = np.random.RandomState(1234 + comm.env_id)

    def sensors(u_full, t):
        s = u_full.reshape(SENSORS, N // SENSORS).mean(axis=1)
        return np.concatenate([s, [t / EP_LEN]])

    while True:
        # identical initial condition on every rank (env-seeded)
        seed = rng.randint(1 << 30)
        u_full0 = np.clip(
            np.random.RandomState(seed).uniform(0.0, 1.0, 3), 0, 1)
        # smooth random IC: sum of 3 low modes
        x = (np.arange(N) + 0.5) / N
        u_full = (u_full0[0] * np.sin(np.pi * x)
                  + u_full0[1] * np.sin(2 * np.pi * x) ** 2
                  + 0.3 * u_full0[2])
        u = u_full[lo:lo + n_loc].copy()     # this rank's slice

        def full_state():
            """Allgather the rod (halo-exchange superset; the real CUP
            apps gather only what the agent observes)."""
            if team is None:
                return u.copy()
            parts = team.allgather(u.copy())
            return np.concatenate(parts)

        uf = full_state()
        comm.sendInitState(sensors(uf, 0))
        for t in range(1, EP_LEN + 1):
            a = comm.recvAction()            # identical on every rank
            src = (a @ PHI)[lo:lo + n_loc]
            # halo exchange: neighbor boundary cells via team collectives
            if team is None:
                left = u[0]
                right = u[-1]
            else:
                bounds = team.allgather((float(u[0]), float(u[-1])))
                left = bounds[rank - 1][1] if rank > 0 else u[0]
                right = bounds[rank + 1][0] if rank < size - 1 else u[-1]
            upad = np.concatenate([[left], u, [right]])
            lap = upad[:-2] - 2 * upad[1:-1] + upad[2:]
            u = u + DT * (KAPPA * lap * (N / 8) ** 2 / N + 0.1 * src)
            u = np.clip(u, -2.0, 3.0)
            uf = full_state()
            mse = float(np.mean((uf - TARGET) ** 2))
            reward = -mse
            if t == EP_LEN:
                comm.sendLastState(sensors(uf, t), reward)
            else:
                comm.sendState(sensors(uf, t), reward)


def main():
    import argparse
    import smarties_tpu
    from smarties_tpu.utils.config import HyperParameters
    p = argparse.ArgumentParser()
    p.add_argument("--nEnvironments", type=int, default=2)
    p.add_argument("--workers", type=int, default=3)
    p.add_argument("--nTrainSteps", type=int, default=2000)
    args = p.parse_args()
    e = smarties_tpu.Engine([])
    e.setNEnvironments(args.nEnvironments)
    e.setNworkersPerEnvironment(args.workers)
    e.setSettings(HyperParameters(minTotObsNum=512, maxTotObsNum=8192,
                                  batchSize=64, nnLayerSizes=[64, 64],
                                  explNoise=0.3))
    e.setNTrainSteps(args.nTrainSteps)
    e.setMaxEpisodeLength(EP_LEN + 1)
    e.run(app_main)
    print(f"trained {e.n_grad_steps} grad steps over "
          f"{e.n_env_steps} env steps")


if __name__ == "__main__":
    main()
