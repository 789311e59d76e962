#!/usr/bin/env python3
"""Distributed-ENVIRONMENT cart-pole demo (SURVEY §2.9 P6).

Mirrors reference apps/cart_pole_distribEnv/cart-pole.cpp: the env
simulation spans a TEAM of 2 processes (Engine::setNworkersPerEnvironment).
Each team member advances its own cart-pole half of the "simulation" and
is a full agent channel, but termination must be agreed by the whole
team — one member's episode end terminates everyone (the member that
failed sends TERM, the others send LAST). The reference coordinates with
MPI_Allgather over environment_app_comm; here the TeamComm pipe
collectives play that role (smarties_tpu/runtime/team.py).

Run:
    python apps/cart_pole_distribEnv/exec.py --nEnvironments 2
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


def app_main(comm, team):
    # designed for 2 processes per env simulation, like the reference app
    assert team.size == 2, "this app needs workersPerEnvironment == 2"
    comm.setStateActionDims(6, 1)
    comm.setActionScales([10.0], [-10.0], areBounds=True)
    # hide the raw angle, keep cos/sin (reference app's b_observable)
    comm.setStateObservable([True, True, True, False, True, True])

    env = CartPole()
    team.barrier()
    while True:                      # train loop
        env.reset()
        comm.sendInitState(env.get_state())
        while True:                  # simulation loop
            action = comm.recvAction()
            my_term = int(env.advance(action))
            # one process terminating must terminate the whole team
            # (MPI_Allgather of the flags in the reference app)
            flags = team.allgather(my_term)
            state, reward = env.get_state(), env.get_reward()
            if any(flags):
                if my_term:
                    comm.sendTermState(state, reward)
                else:
                    comm.sendLastState(state, reward)
                break
            comm.sendState(state, reward)


if __name__ == "__main__":
    import smarties_tpu

    e = smarties_tpu.Engine(sys.argv)
    if e.parse():
        sys.exit()
    e.setNworkersPerEnvironment(2)
    e.run(app_main)
