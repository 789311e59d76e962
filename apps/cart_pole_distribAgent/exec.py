#!/usr/bin/env python3
"""Distributed-AGENT cart-pole demo (SURVEY §2.9 P6).

Mirrors reference apps/cart_pole_distribAgent/cart-pole.cpp: ONE logical
agent spans every process of the env team
(Communicator::envHasDistributedAgents). The joint agent controls N
cart-poles, one per team member: every member assembles the identical
combined state via team collectives, only rank 0's messages are ingested
by the learner, and every member receives the same joint action (the
action MPI_Bcast over environment_app_comm, Core/Worker.cpp:371-383).

Run:
    python apps/cart_pole_distribAgent/exec.py --nEnvironments 2
"""
import importlib.util
import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "cart_pole_py_exec", os.path.join(_here, "..", "cart_pole_py",
                                      "exec.py"))
_cp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cp)
CartPole = _cp.CartPole


def app_main(comm, team):
    N = team.size
    # the same agents run on every rank of the team:
    comm.envHasDistributedAgents()
    # joint MDP: N cart-poles with joint controls, 4 state + 1 action
    # vars per process (reference app's setStateActionDims(4*N, N))
    comm.setStateActionDims(4 * N, N)
    comm.setActionScales([10.0] * N, [-10.0] * N, areBounds=True)

    env = CartPole()
    team.barrier()
    while True:                      # train loop
        env.reset()
        comm.sendInitState(team.allgather_array(env.u[:4]))
        while True:                  # simulation loop
            joint_action = comm.recvAction()
            assert len(joint_action) == N
            my_term = int(env.advance([joint_action[team.rank]]))
            n_term = team.allreduce(my_term)
            sum_reward = team.allreduce(env.get_reward())
            state = team.allgather_array(env.u[:4])
            # any member terminating ends the joint episode
            if n_term > 0:
                comm.sendTermState(state, sum_reward)
                break
            comm.sendState(state, sum_reward)


if __name__ == "__main__":
    import smarties_tpu

    e = smarties_tpu.Engine(sys.argv)
    if e.parse():
        sys.exit()
    e.setNworkersPerEnvironment(2)
    e.run(app_main)
