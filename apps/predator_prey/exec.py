#!/usr/bin/env python3
"""Competing-agents demo: predator vs prey, one learner per agent.

External-app analog of reference apps/predator_prey/pp.cpp: two agents
with DIFFERENT MDPs (agentsDefineDifferentMDP) trained by two separate
learners in one session. The predator moves at half the prey's speed and
is rewarded by -distance; the prey sees the predator's bearing corrupted
by speed- and distance-dependent noise and is rewarded by +distance
(zero-sum). Episodes last 500 steps (sendLastState: time limit, not a
terminal MDP state).

The pure-JAX vectorized twin of this env is smarties_tpu/envs/
predator_prey.py (used by the MultiTrainer tests); this script drives the
same problem through the Engine + Communicator external path.

Run:
    python apps/predator_prey/exec.py --nEnvironments 8
"""
import sys

import numpy as np

EXTENT = 1.0
MAX_STEP = 500
VEL_SCALE = 0.02 * EXTENT


class Entity:
    def __init__(self, vel_magnitude):
        self.vel = vel_magnitude
        self.p = np.zeros(2)
        self.act_scal = vel_magnitude

    def reset(self, rng):
        self.p = rng.uniform(0.0, EXTENT, 2)
        self.act_scal = self.vel

    def advance(self, act):
        act = np.asarray(act, np.float64)
        speed = float(np.hypot(act[0], act[1]))
        self.act_scal = min(speed, self.vel)
        if speed > self.vel:
            act = act * self.vel / speed
        self.p = np.clip(self.p + act, 0.0, EXTENT)

    def angle_to(self, other):
        rel = other.p - self.p
        return float(np.arctan2(rel[1], rel[0]))

    def distance_to(self, other):
        return float(np.hypot(*(other.p - self.p)))


class Predator(Entity):
    """Moves at vel_penalty x the prey speed; exact bearing to the prey."""

    def __init__(self, vel_scale, vel_penalty=0.5):
        super().__init__(vel_penalty * vel_scale)

    def get_state(self, prey):
        ang = self.angle_to(prey)
        return np.array([self.p[0], self.p[1], np.cos(ang), np.sin(ang)])

    def get_reward(self, prey):
        return -self.distance_to(prey)


class Prey(Entity):
    """Full speed; noisy bearing to the predator (noise grows with the
    prey's own speed and the distance — moving slow near the predator
    gives a clean ping)."""

    def __init__(self, vel_scale, std_noise=1.0):
        super().__init__(vel_scale)
        self.std_noise = std_noise

    def get_state(self, pred, rng):
        ang = self.angle_to(pred)
        noise_amp = (self.std_noise * self.distance_to(pred)
                     * self.act_scal / self.vel ** 2)
        ang = ang + rng.normal(0.0, noise_amp)
        return np.array([self.p[0], self.p[1], np.cos(ang), np.sin(ang)])

    def get_reward(self, pred):
        return self.distance_to(pred)


def app_main(comm):
    comm.setNumAgents(2)                 # predator, prey
    comm.agentsDefineDifferentMDP()      # each learns its own policy
    comm.setStateActionDims(4, 2, 0)
    comm.setStateActionDims(4, 2, 1)

    rng = np.random.RandomState(comm.env_id)
    pred = Predator(VEL_SCALE, 0.5)
    prey = Prey(VEL_SCALE, 1.0)

    while True:                          # train loop
        pred.reset(rng)
        prey.reset(rng)
        comm.sendInitState(pred.get_state(prey), 0)
        comm.sendInitState(prey.get_state(pred, rng), 1)
        for step in range(MAX_STEP):     # simulation loop
            pred.advance(comm.recvAction(0))
            prey.advance(comm.recvAction(1))
            last = step == MAX_STEP - 1
            send = comm.sendLastState if last else comm.sendState
            send(pred.get_state(prey), pred.get_reward(prey), 0)
            send(prey.get_state(pred, rng), prey.get_reward(pred), 1)


if __name__ == "__main__":
    import smarties_tpu

    e = smarties_tpu.Engine(sys.argv)
    if e.parse():
        sys.exit()
    e.run(app_main)
