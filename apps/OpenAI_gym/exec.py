#!/usr/bin/env python3
"""OpenAI gym adapter app (classic control + MuJoCo).

Reference analog: apps/OpenAI_gym/exec.py. Wraps any gym env into the
Communicator control flow; continuous Box actions get bounded scales from
the action space, Discrete spaces become action options.

    python apps/OpenAI_gym/exec.py Pendulum-v1 --nEnvironments 8
"""
import sys

import numpy as np

try:
    import gymnasium as gym
    _GYMNASIUM = True
except ImportError:
    try:
        import gym
        _GYMNASIUM = False
    except ImportError:
        gym = None


def make_app_main(env_name: str):
    def app_main(comm):
        env = gym.make(env_name)
        obs_space, act_space = env.observation_space, env.action_space
        dim_s = int(np.prod(obs_space.shape))
        if hasattr(act_space, "n"):
            comm.setStateActionDims(dim_s, 1)
            comm.setActionOptions(int(act_space.n))
        else:
            dim_a = int(np.prod(act_space.shape))
            comm.setStateActionDims(dim_s, dim_a)
            comm.setActionScales(act_space.high.tolist(),
                                 act_space.low.tolist(), areBounds=True)

        while True:
            if _GYMNASIUM:
                obs, _ = env.reset()
            else:
                obs = env.reset()
            comm.sendInitState(np.asarray(obs).ravel())
            while True:
                act = comm.recvAction()
                if hasattr(act_space, "n"):
                    a = int(act[0])
                else:
                    a = np.asarray(act, act_space.dtype)
                out = env.step(a)
                if len(out) == 5:   # gymnasium API
                    obs, r, terminated, truncated, _ = out
                else:
                    obs, r, done, info = out
                    truncated = bool(info.get("TimeLimit.truncated", False))
                    terminated = done and not truncated
                obs = np.asarray(obs).ravel()
                if truncated:
                    comm.sendLastState(obs, r)
                    break
                elif terminated:
                    comm.sendTermState(obs, r)
                    break
                else:
                    comm.sendState(obs, r)

    return app_main


if __name__ == "__main__":
    if gym is None:
        sys.exit("gym/gymnasium not installed")
    env_name = sys.argv[1]
    import smarties_tpu

    e = smarties_tpu.Engine([sys.argv[0]] + sys.argv[2:])
    if e.parse():
        sys.exit()
    e.run(make_app_main(env_name))
