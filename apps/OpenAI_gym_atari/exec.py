#!/usr/bin/env python3
"""Atari adapter app with DQN-style preprocessing.

Reference analog: apps/OpenAI_gym_atari/exec.py — NoFrameskip env with
max-pooled frame skip, life-loss episode ends, noop resets, 84x84
grayscale, 4-frame stacking via setNumAppendedPastObservations(3), and the
conv stack declared through setPreprocessingConv2d (Mnih et al. 2015
geometry).

    python apps/OpenAI_gym_atari/exec.py Pong --nEnvironments 8
"""
import sys

import numpy as np

try:
    import gymnasium as gym
except ImportError:
    try:
        import gym
    except ImportError:
        gym = None
try:
    import cv2
    cv2.ocl.setUseOpenCL(False)
except ImportError:
    cv2 = None


class AtariEnv:
    """Frame-skip max-pooling, noop reset, life-loss termination."""

    def __init__(self, game: str, n_skip: int = 4, noop_max: int = 30):
        self.env = gym.make(game + "NoFrameskip-v4")
        self.n_skip, self.noop_max = n_skip, noop_max
        self.lives = 0
        self.was_real_done = True
        self._pool = None

    def _obs(self):
        frame = self._pool.max(axis=0)
        gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        return cv2.resize(gray, (84, 84),
                          interpolation=cv2.INTER_AREA).ravel()

    def _raw_reset(self):
        out = self.env.reset()
        obs = out[0] if isinstance(out, tuple) else out
        self._pool = np.stack([obs, obs])

    def reset(self):
        if self.was_real_done:
            self._raw_reset()
            for _ in range(np.random.randint(1, self.noop_max + 1)):
                self._raw_step(0)
        else:
            self._raw_step(0)
        self.lives = self.env.unwrapped.ale.lives()
        return self._obs()

    def _raw_step(self, a):
        out = self.env.step(a)
        if len(out) == 5:
            obs, r, term, trunc, info = out
            done = term or trunc
        else:
            obs, r, done, info = out
        self._pool = np.stack([self._pool[-1], obs])
        return r, done

    def step(self, a):
        total = 0.0
        done = False
        for _ in range(self.n_skip):
            r, done = self._raw_step(a)
            total += r
            if done:
                break
        self.was_real_done = done
        lives = self.env.unwrapped.ale.lives()
        if lives < self.lives and lives > 0:
            done = True
        self.lives = lives
        return self._obs(), total, done


def make_app_main(game: str):
    def app_main(comm):
        env = AtariEnv(game)
        comm.setStateActionDims(84 * 84, 1)
        comm.setActionOptions(int(env.env.action_space.n))
        comm.setNumAppendedPastObservations(3)
        # Mnih et al. 2015 conv geometry (84x84x4 input)
        comm.setPreprocessingConv2d(84, 84, 4, 32, 8, 4)
        comm.setPreprocessingConv2d(20, 20, 32, 64, 4, 2)
        comm.setPreprocessingConv2d(9, 9, 64, 64, 3, 1)

        while True:
            comm.sendInitState(env.reset())
            while True:
                a = int(comm.recvAction()[0])
                obs, r, done = env.step(a)
                if done:
                    comm.sendTermState(obs, r)
                    break
                comm.sendState(obs, r)

    return app_main


if __name__ == "__main__":
    if gym is None or cv2 is None:
        sys.exit("gym + cv2 required")
    game = sys.argv[1]
    import smarties_tpu

    e = smarties_tpu.Engine([sys.argv[0]] + sys.argv[2:])
    if e.parse():
        sys.exit()
    e.run(make_app_main(game))
