#!/usr/bin/env python3
"""DeepMind Control Suite adapter app.

Reference analog: apps/Deepmind_control/exec.py. Flattens the observation
dict, maps bounded action specs to scales.

    python apps/Deepmind_control/exec.py walker walk --nEnvironments 8
"""
import sys

import numpy as np

try:
    from dm_control import suite
except ImportError:
    suite = None


def make_app_main(domain: str, task: str):
    def app_main(comm):
        env = suite.load(domain_name=domain, task_name=task)
        spec = env.action_spec()
        dim_a = int(np.prod(spec.shape))
        obs_spec = env.observation_spec()
        dim_s = int(sum(np.prod(v.shape) if v.shape else 1
                        for v in obs_spec.values()))
        comm.setStateActionDims(dim_s, dim_a)
        comm.setActionScales(spec.maximum.tolist(), spec.minimum.tolist(),
                             areBounds=True)

        def flat_obs(ts):
            return np.concatenate([np.asarray(v).ravel()
                                   for v in ts.observation.values()])

        while True:
            ts = env.reset()
            comm.sendInitState(flat_obs(ts))
            while True:
                act = np.asarray(comm.recvAction(), np.float64)
                ts = env.step(act)
                obs, r = flat_obs(ts), float(ts.reward or 0.0)
                if ts.last():
                    # dm_control episodes end by time limit (discount==1)
                    if ts.discount == 0.0:
                        comm.sendTermState(obs, r)
                    else:
                        comm.sendLastState(obs, r)
                    break
                comm.sendState(obs, r)

    return app_main


if __name__ == "__main__":
    if suite is None:
        sys.exit("dm_control not installed")
    domain, task = sys.argv[1], sys.argv[2]
    import smarties_tpu

    e = smarties_tpu.Engine([sys.argv[0]] + sys.argv[3:])
    if e.parse():
        sys.exit()
    e.run(make_app_main(domain, task))
