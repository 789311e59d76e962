#!/usr/bin/env python3
"""Cart-pole demo app for the external-env (Communicator) API.

Mirrors the reference demo (apps/cart_pole_py/exec.py): the APP owns the
control flow and calls into the framework through the Communicator —
the "inverted control" interface. Run:

    python apps/cart_pole_py/exec.py --nEnvironments 8 --nTrainSteps 20000
"""
import sys

import numpy as np


class CartPole:
    """Same dynamics as the reference app (exec.py:14-77), RK4 instead of
    scipy dopri5 so the app has no scipy dependency."""

    def __init__(self):
        self.dt = 0.02
        self.u = np.zeros(4)
        self.step_id = 0

    def reset(self):
        self.u = np.random.uniform(-0.05, 0.05, 4)
        self.step_id = 0

    def is_failed(self):
        return abs(self.u[0]) > 2.4 or abs(self.u[2]) > np.pi / 15

    def is_over(self):
        return self.step_id >= 500 or self.is_failed()

    def is_truncated(self):
        return self.step_id >= 500 and not self.is_failed()

    @staticmethod
    def _f(u, F):
        mp, mc, ell, g = 0.1, 1.0, 0.5, 9.81
        x, v, a, w = u
        cosy, siny = np.cos(a), np.sin(a)
        tot = mp + mc
        fac2 = ell * (4.0 / 3.0 - mp * cosy * cosy / tot)
        f1 = F + mp * ell * w * w * siny
        wdot = (g * siny - f1 * cosy / tot) / fac2
        vdot = (f1 - mp * ell * wdot * cosy) / tot
        return np.array([v, vdot, w, wdot])

    def advance(self, action):
        F = float(action[0])
        dt = self.dt / 4
        for _ in range(4):
            k1 = self._f(self.u, F)
            k2 = self._f(self.u + dt / 2 * k1, F)
            k3 = self._f(self.u + dt / 2 * k2, F)
            k4 = self._f(self.u + dt * k3, F)
            self.u = self.u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        self.step_id += 1
        return self.is_over()

    def get_state(self):
        return np.array([self.u[0], self.u[1], self.u[2], self.u[3],
                         np.cos(self.u[2]), np.sin(self.u[2])])

    def get_reward(self):
        return 1.0 - 1.0 * self.is_failed()


def app_main(comm):
    env = CartPole()
    comm.setStateActionDims(6, 1)
    comm.setActionScales([10.0], [-10.0], areBounds=True)
    comm.setStateObservable([True, True, False, True, True, True])

    while True:
        env.reset()
        comm.sendInitState(env.get_state())
        while True:
            action = comm.recvAction()
            terminated = env.advance(action)
            state, reward = env.get_state(), env.get_reward()
            if env.is_truncated():
                comm.sendLastState(state, reward)
                break
            elif terminated:
                comm.sendTermState(state, reward)
                break
            else:
                comm.sendState(state, reward)


if __name__ == "__main__":
    import smarties_tpu

    e = smarties_tpu.Engine(sys.argv)
    if e.parse():
        sys.exit()
    e.run(app_main)
