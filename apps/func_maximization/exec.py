#!/usr/bin/env python3
"""Stateless function maximization with CMA (optimization-interface sugar).

Reference analog: apps/func_maximization — the Communicator's
getOptimizationParameters/setOptimizationEvaluation sugar
(Communicator.h:148-161) turns a stateless objective into 1-step episodes;
CMA maximizes it. Objective here: negative shifted sphere (optimum at 0.4).
"""
import numpy as np


DIM = 4
OPT = 0.4


def objective(x):
    return float(np.sum((np.asarray(x) - OPT) ** 2))  # minimize


def app_main(comm):
    comm.setStateActionDims(1, DIM)
    comm.setActionScales([1.0] * DIM, [-1.0] * DIM, areBounds=True)
    while True:
        x = comm.getOptimizationParameters()
        comm.setOptimizationEvaluation(objective(x))


if __name__ == "__main__":
    import sys

    from smarties_tpu.algos.cma import CMAES
    from smarties_tpu.runtime.communicator import spec_to_mdp
    from smarties_tpu.runtime.env_pool import EnvPool
    from smarties_tpu.utils.config import HyperParameters

    cfg = HyperParameters(learner="CMA", ESpopSize=8, batchSize=4,
                          explNoise=0.0, nnLayerSizes=[8], learnrate=0.05)
    pool = EnvPool(app_main, n_envs=8)
    mdp = pool.probe_spec()
    cma = CMAES.__new__(CMAES)
    CMAES.__init__(cma, None, mdp, cfg, n_envs=8, max_len=4)
    cma.run_external(pool, n_generations=40, log_every=10)
    pool.kill()
