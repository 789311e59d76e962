#!/usr/bin/env python3
"""Multi-agent cart-pole with DIFFERENT per-agent MDPs.

Mirrors reference apps/cart_pole_many/cart-pole.cpp: one env hosts two
agents, each balancing its own cart-pole, trained by two separate
learners (Communicator::agentsDefineDifferentMDP). Agent 1 is partially
observable — it sees neither linear nor angular velocity — so its recipe
should use a recurrent net; agent 0's controls are inverted so the two
optimal policies differ.

Run:
    python apps/cart_pole_many/exec.py --nEnvironments 4
"""
import importlib.util
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "cart_pole_py_exec", os.path.join(_here, "..", "cart_pole_py",
                                      "exec.py"))
_cp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cp)
CartPole = _cp.CartPole


def app_main(comm):
    comm.setNumAgents(2)
    comm.setStateActionDims(6, 1)
    comm.setActionScales([10.0], [-10.0], areBounds=True)
    # state vars:            x     vx    angvel  ang    cos   sin
    comm.setStateObservable([True, True, True, False, True, True])

    # everything set before agentsDefineDifferentMDP applies to all
    # agents; afterwards setters take agent_id (reference app lines 28-35)
    comm.agentsDefineDifferentMDP()
    # agent 1 is partially observed: velocities are hidden
    comm.setStateObservable([True, False, False, False, True, True], 1)
    comm.setIsPartiallyObservable(1)

    env1, env2 = CartPole(), CartPole()
    while True:                      # train loop
        env1.reset()
        env2.reset()
        comm.sendInitState(env1.get_state(), 0)
        comm.sendInitState(env2.get_state(), 1)
        while True:                  # simulation loop
            action1 = comm.recvAction(0)
            action1 = [-action1[0]]  # make the two optimal policies differ
            action2 = comm.recvAction(1)
            term1 = env1.advance(action1)
            term2 = env2.advance(action2)
            s1, s2 = env1.get_state(), env2.get_state()
            r1, r2 = env1.get_reward(), env2.get_reward()
            if term1 or term2:
                (comm.sendTermState if term1 else comm.sendLastState)(
                    s1, r1, 0)
                (comm.sendTermState if term2 else comm.sendLastState)(
                    s2, r2, 1)
                break
            comm.sendState(s1, r1, 0)
            comm.sendState(s2, r2, 1)


if __name__ == "__main__":
    import smarties_tpu

    e = smarties_tpu.Engine(sys.argv)
    if e.parse():
        sys.exit()
    e.run(app_main)
